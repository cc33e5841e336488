"""Rate-distortion sweep: train/encode/decode across lambda values and
evaluate bpp vs D1 PSNR across decode thresholds.

Fulfils the sweep configs the reference's workflow implies (BASELINE.json:
"RD sweep: lambda {100,200,400} x thh thresholds, bpp vs D1-PSNR curve").
One JSON line per (lambda, thh) lands in the output file; a summary table
prints at the end.

Usage:
  python scripts/rd_sweep.py cloud.ply --lambdas 100,200,400 \
      --thhs 0.5,0.6,0.65,0.7 --epochs 501 --out rd.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cloud")
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--level", type=int, default=5)
    ap.add_argument("--lambdas", type=str, default="100,200,400")
    ap.add_argument("--thhs", type=str, default="0.5,0.6,0.65,0.7")
    ap.add_argument("--epochs", type=int, default=501)
    ap.add_argument("--workdir", type=str, default="/tmp/rd_sweep")
    ap.add_argument("--out", type=str, default="rd.jsonl")
    ap.add_argument("--d1_platform", type=str, default=None,
                    help="backend for D1 EDT (default: ambient device)")
    ap.add_argument("--no_d2", action="store_true",
                    help="skip the point-to-plane (D2) metric")
    args = ap.parse_args()

    from nvfpcc_tpu import codec
    from nvfpcc_tpu.cli import load_or_build_artifacts
    from nvfpcc_tpu.config import CodecConfig, ModelConfig, TrainConfig
    from nvfpcc_tpu.io.ply import read_ply_points
    from nvfpcc_tpu.metrics import d1_psnr, d2_psnr
    from nvfpcc_tpu.train.loop import train
    from nvfpcc_tpu.utils.cache import enable_compilation_cache, enable_hang_diagnostics

    enable_compilation_cache()
    enable_hang_diagnostics()
    os.makedirs(args.workdir, exist_ok=True)
    art = load_or_build_artifacts(args.cloud, args.depth, args.level)
    n_points = int(art["gt"].sum())
    ref_pts = np.rint(read_ply_points(args.cloud)).astype(np.int64)
    mcfg = ModelConfig()
    rows = []

    for lmbda in [float(x) for x in args.lambdas.split(",")]:
        tag = f"l{int(lmbda)}"
        ckpt_dir = os.path.join(args.workdir, tag)
        tcfg = TrainConfig(lmbda=lmbda, epochs=args.epochs)
        t0 = time.time()
        spec, state = train(
            art["gt"], art["dist"], mcfg, tcfg,
            checkpoint_dir=ckpt_dir,
            log=lambda s: print(f"[{tag}] {s}") if "TEST" in s else None,
            resume=True,
        )
        train_s = time.time() - t0

        for thh in [float(x) for x in args.thhs.split(",")]:
            ccfg = CodecConfig(
                thh_encode=thh, thh_decode=thh,
                depth=args.depth, level=args.level,
            )
            result = codec.encode(
                state.params, np.asarray(state.emb), art["origins"],
                mcfg, ccfg, n_points,
            )
            m = d1_psnr(ref_pts, result.points, args.depth,
                        platform=args.d1_platform)
            m2 = (
                None
                if args.no_d2
                else d2_psnr(ref_pts, result.points, args.depth,
                             platform=args.d1_platform)
            )
            row = {
                "lambda": lmbda,
                "thh": thh,
                "bpp": result.stats["bpp"],
                "b_latent": result.stats["b_latent"],
                "b_net": result.stats["b_net"],
                "b_origins": result.stats["b_origins"],
                "d1_psnr": m["psnr"],
                "d1_mse": m["mse"],
                **({} if m2 is None else {"d2_psnr": m2["psnr"]}),
                "n_points_rec": result.stats["n_points_rec"],
                "n_points_src": n_points,
                "train_s": round(train_s, 1),
            }
            rows.append(row)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            d2s = "" if m2 is None else f" D2={row['d2_psnr']:.2f}dB"
            print(
                f"[rd] lambda={lmbda:.0f} thh={thh:.2f} bpp={row['bpp']:.4f} "
                f"D1={row['d1_psnr']:.2f}dB{d2s} pts={row['n_points_rec']}"
            )

    print("\nlambda  thh   bpp      D1(dB)   pts")
    for r in rows:
        print(
            f"{r['lambda']:6.0f} {r['thh']:5.2f} {r['bpp']:8.4f} "
            f"{r['d1_psnr']:8.2f} {r['n_points_rec']:9d}"
        )


if __name__ == "__main__":
    main()
