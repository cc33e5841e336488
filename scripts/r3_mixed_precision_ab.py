"""Round-3 mixed-precision training A/B: f32 vs compute_dtype=bf16.

Same cloud (vox10 sphere, the flagship synthetic), same recipe (auto entropy
mode, lambda 200, 501 epochs, B=16), two arms differing ONLY in
TrainConfig.compute_dtype. Reports per-arm:

  - steady-state train wall-clock (total and s/epoch, measured in situ — the
    bench-relevant number),
  - encode -> decode roundtrip with the parity gate,
  - stream split (bpp gross / b_latent / b_net) and true D1 PSNR at several
    thresholds.

This is the decision measurement for whether bf16 conv arithmetic becomes a
recommended (or default) train setting: it must cut epoch time without
costing RD (the overfitting regime is noise-tolerant, but STE rounding and
tiny 8-channel layers could interact with precision).

Usage: python scripts/r3_mixed_precision_ab.py [--arms f32,bf16]
           [--epochs 501] [--thhs 0.60,0.65,0.70] [--workdir /tmp/r3mpab]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTH, LEVEL = 10, 5


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arms", default="f32,bf16")
    ap.add_argument("--shape", default="sphere", help="synth_cloud shape "
                    "(round-4 extension: validate the dtype A/B off-sphere)")
    ap.add_argument("--thhs", default="0.60,0.65,0.70")
    ap.add_argument("--epochs", type=int, default=501)
    ap.add_argument("--workdir", default="/tmp/r3mpab")
    ap.add_argument("--out", default="results/round3/mixed_precision_ab.json")
    args = ap.parse_args()

    from nvfpcc_tpu.cli import main as cli_main
    from nvfpcc_tpu.io.ply import read_ply_points, write_ply_points
    from nvfpcc_tpu.metrics import d1_psnr, d2_psnr
    from nvfpcc_tpu.utils.cache import enable_compilation_cache
    from scripts.synth_cloud import SHAPES

    enable_compilation_cache()
    cloud = f"/tmp/{args.shape}_vox10.ply"
    if not os.path.exists(cloud):
        pts = SHAPES[args.shape](DEPTH)
        write_ply_points(cloud, pts)
        print(f"[mpab] {args.shape}: {len(pts)} pts", flush=True)
    src = np.rint(read_ply_points(cloud)).astype(np.int64)
    n = len(src)
    common = ["--depth", str(DEPTH), "--level", str(LEVEL)]

    def stage(name, argv):
        t0 = time.perf_counter()
        rc = cli_main(argv)
        dt = time.perf_counter() - t0
        print(f"[mpab] {name}: {dt:.1f}s (rc={rc})", flush=True)
        if rc:
            raise SystemExit(f"{name} failed with status {rc}")
        return dt

    results = {}
    for arm in args.arms.split(","):
        arm = arm.strip()
        work = os.path.join(args.workdir, arm)
        ckpts = os.path.join(work, "ckpts")
        os.makedirs(work, exist_ok=True)
        train_s = None
        if not os.path.exists(os.path.join(ckpts, f"{args.epochs - 1:04d}.npz")):
            train_s = stage(f"train[{arm}]", [
                "train", cloud, *common, "--epochs", str(args.epochs),
                "--checkpoint_dir", ckpts, "--compute_dtype", arm,
                "--resume",  # pick up where a tunnel-interrupted run stopped
            ])
        thhs = [t.strip() for t in args.thhs.split(",")]
        pack = os.path.join(work, "pack.pk")
        rc_enc = os.path.join(work, "rc_enc.ply")
        stage(f"encode[{arm}]", [
            "encode", cloud, *common, "--load_checkpoint", ckpts,
            "--pack_fn", pack, "--recon", rc_enc, "--thh", thhs[0],
        ])
        from nvfpcc_tpu import codec as _codec
        pk = _codec.load_pack(pack)
        rows = []
        for i, thh in enumerate(thhs):
            rc_dec = os.path.join(work, f"rc_dec_{thh}.ply")
            stage(f"decode[{arm}] thh{thh}",
                  ["decode", pack, "--recon", rc_dec, "--thh", thh])
            b = read_ply_points(rc_dec)
            if i == 0:
                a = read_ply_points(rc_enc)
                if not (a.shape == b.shape and np.array_equal(a, b)):
                    raise SystemExit(f"PARITY FAIL in arm {arm}")
            rec = np.rint(b).astype(np.int64)
            m = d1_psnr(src, rec, depth=DEPTH, platform=None)
            m2 = d2_psnr(src, rec, depth=DEPTH, platform=None)
            rows.append({
                "thh": float(thh),
                "bpp_gross": round(8.0 * os.path.getsize(pack) / n, 4),
                "b_latent": round(8.0 * len(pk["latent_pack"]["stream"]) / n, 4),
                "b_net": round(
                    8.0 * len(pk["net_weight_pack"]["bit_stream"]) / n, 4),
                "d1_psnr": round(float(m["psnr"]), 4),
                "d2_psnr": round(float(m2["psnr"]), 4),
                "n_points_rec": int(len(b)),
            })
            print(f"[mpab] ROW {arm} " + json.dumps(rows[-1]), flush=True)
        results[arm] = {
            "train_s_total": None if train_s is None else round(train_s, 1),
            "s_per_epoch": None if train_s is None else round(
                train_s / args.epochs, 3),
            "entropy_mode": pk["model"]["entropy_mode"],
            "parity": True,
            "rows": rows,
        }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("[mpab] wrote " + args.out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
