"""Round-3 vox11 ctx_post RD sweep: extend the measured-dominant recipe
(train plain ctx -> encode auto: ctx_ar + post-hoc predictor fit) across
lambda, against the round-2 channel anchors (RESULTS.md vox11 bracketing).

For each lambda: one 501-epoch ctx train on the vox11 sphere (the exact
round-2 artifacts), then the `--entropy_mode auto` encode (which at level 6
resolves to the ctx_post upgrade), decode, parity, and true D1 at several
thresholds. One process, warm caches, real TPU.

Usage: python scripts/r3_v11_ctxpost_sweep.py --lambdas 450,120 \
           --workdir /tmp/r3sweep [--epochs 501] [--thhs 0.65,0.70,0.75]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLOUD = "/tmp/sphere_vox11.ply"
DEPTH, LEVEL = 11, 6


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lambdas", default="450,120")
    ap.add_argument("--thhs", default="0.65,0.70,0.75")
    ap.add_argument("--epochs", type=int, default=501)
    ap.add_argument("--workdir", default="/tmp/r3sweep")
    ap.add_argument("--out_dir", default="results/round3")
    ap.add_argument(
        "--cloud", default=CLOUD,
        help="vox11 source cloud (round-5 item 6: the ctx_post economics "
        "need a second, non-sphere large-cloud measurement)",
    )
    ap.add_argument(
        "--tag", default="",
        help="suffix for the output json (so a second cloud's rows do not "
        "overwrite the sphere's)",
    )
    args = ap.parse_args()

    from nvfpcc_tpu.cli import main as cli_main
    from nvfpcc_tpu.io.ply import read_ply_points
    from nvfpcc_tpu.metrics import d1_psnr, d2_psnr
    from nvfpcc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.out_dir, exist_ok=True)
    cloud = args.cloud
    src = np.rint(read_ply_points(cloud)).astype(np.int64)
    common = ["--depth", str(DEPTH), "--level", str(LEVEL)]

    def stage(name, argv):
        t0 = time.perf_counter()
        rc = cli_main(argv)
        dt = time.perf_counter() - t0
        print(f"[sweep] {name}: {dt:.1f}s (rc={rc})", flush=True)
        if rc:
            raise SystemExit(f"{name} failed with status {rc}")
        return dt

    for lam in args.lambdas.split(","):
        lam = lam.strip()
        work = os.path.join(args.workdir, f"l{lam}")
        ckpts = os.path.join(work, "ckpts")
        os.makedirs(work, exist_ok=True)
        if not os.path.exists(os.path.join(ckpts, f"{args.epochs - 1:04d}.npz")):
            stage(f"train l{lam}", [
                "train", cloud, *common, "--lambda", lam,
                "--epochs", str(args.epochs), "--checkpoint_dir", ckpts,
                "--resume",  # pick up where a tunnel-interrupted run stopped
            ])
        thhs = [t.strip() for t in args.thhs.split(",")]
        # one encode per lambda (the rate does not depend on thh); the other
        # thresholds decode the SAME pack with the --thh override
        pack = os.path.join(work, "pack.pk")
        rc_enc = os.path.join(work, "rc_enc.ply")
        stage(f"encode l{lam}", [
            "encode", cloud, *common, "--load_checkpoint", ckpts,
            "--pack_fn", pack, "--recon", rc_enc, "--thh", thhs[0],
        ])
        from nvfpcc_tpu import codec as _codec
        pk = _codec.load_pack(pack)
        n = len(src)
        rows = []
        for i, thh in enumerate(thhs):
            rc_dec = os.path.join(work, f"rc_dec_{thh}.ply")
            stage(f"decode l{lam} thh{thh}",
                  ["decode", pack, "--recon", rc_dec, "--thh", thh])
            b = read_ply_points(rc_dec)
            if i == 0:
                a = read_ply_points(rc_enc)
                parity = a.shape == b.shape and bool(np.array_equal(a, b))
                if not parity:
                    raise SystemExit("PARITY FAIL")
            rec = np.rint(b).astype(np.int64)
            m = d1_psnr(src, rec, depth=DEPTH, platform=None)
            m2 = d2_psnr(src, rec, depth=DEPTH, platform=None)
            row = {
                "lambda": float(lam), "thh": float(thh),
                "bpp_gross": round(8.0 * os.path.getsize(pack) / n, 4),
                "b_latent": round(8.0 * len(pk["latent_pack"]["stream"]) / n, 4),
                "b_net": round(
                    8.0 * len(pk["net_weight_pack"]["bit_stream"]) / n, 4
                ),
                "d1_psnr": round(float(m["psnr"]), 4),
                "d2_psnr": round(float(m2["psnr"]), 4),
                "parity": bool(parity) if i == 0 else None,
                "n_points_rec": int(len(b)),
                "entropy_mode": pk["model"]["entropy_mode"],
                "ctx_hidden": int(pk["model"].get("ctx_hidden", 8)),
            }
            rows.append(row)
            print("[sweep] ROW " + json.dumps(row), flush=True)
        suffix = f"_{args.tag}" if args.tag else ""
        out = os.path.join(args.out_dir, f"v11_ctxpost_l{lam}{suffix}.json")
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"[sweep] wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
