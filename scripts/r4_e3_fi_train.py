"""Round-4 E3 artifact: vox10 ctx co-train with the WORKING (feature-init)
predictor — the decision run whose round-3 number lived only in a train log
(VERDICT round 3, provenance gap).

One fresh 501-epoch vox10-sphere train with `--entropy_mode ctx
--ctx_train_init feature`, then encode (the checkpoint's own ctx model, no
ctx_post) -> decode -> parity -> true D1/D2. The comparison anchors are the
round-2 zero-init ctx train (b_latent 0.0917, stream 0.2374, D1 70.97) and
the channel run (0.0987 / 0.2467 / 70.63) — RESULTS.md round 2 table.

Usage: python scripts/r4_e3_fi_train.py [--epochs 501]
           [--out results/round4/e3_ctx_fi_vox10.json]
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
    ap.add_argument("--epochs", type=int, default=501)
    ap.add_argument("--thhs", default="0.60,0.65,0.70")
    ap.add_argument("--workdir", default="/tmp/r4e3")
    ap.add_argument("--out", default="results/round4/e3_ctx_fi_vox10.json")
    args = ap.parse_args()

    from nvfpcc_tpu.cli import main as cli_main
    from nvfpcc_tpu.io.ply import read_ply_points, write_ply_points
    from nvfpcc_tpu.metrics import d1_psnr, d2_psnr
    from nvfpcc_tpu.utils.cache import enable_compilation_cache
    from scripts.synth_cloud import SHAPES

    enable_compilation_cache()
    cloud = "/tmp/sphere_vox10.ply"
    if not os.path.exists(cloud):
        pts = SHAPES["sphere"](DEPTH)
        write_ply_points(cloud, pts)
    src = np.rint(read_ply_points(cloud)).astype(np.int64)
    n = len(src)
    common = ["--depth", str(DEPTH), "--level", str(LEVEL)]

    def stage(name, argv):
        t0 = time.perf_counter()
        rc = cli_main(argv)
        print(f"[e3] {name}: {time.perf_counter() - t0:.1f}s (rc={rc})", flush=True)
        if rc:
            raise SystemExit(f"{name} failed with status {rc}")

    ckpts = os.path.join(args.workdir, "ckpts")
    os.makedirs(args.workdir, exist_ok=True)
    if not os.path.exists(os.path.join(ckpts, f"{args.epochs - 1:04d}.npz")):
        stage("train", [
            "train", cloud, *common, "--entropy_mode", "ctx",
            "--ctx_train_init", "feature", "--epochs", str(args.epochs),
            "--checkpoint_dir", ckpts, "--resume",
        ])
    thhs = [t.strip() for t in args.thhs.split(",")]
    pack = os.path.join(args.workdir, "pack.pk")
    rc_enc = os.path.join(args.workdir, "rc_enc.ply")
    # explicit --entropy_mode ctx: E3 measures the co-trained predictor as
    # packed, not an auto-mode ctx_post upgrade
    stage("encode", [
        "encode", cloud, *common, "--load_checkpoint", ckpts,
        "--entropy_mode", "ctx", "--pack_fn", pack, "--recon", rc_enc,
        "--thh", thhs[0],
    ])
    from nvfpcc_tpu import codec as _codec
    pk = _codec.load_pack(pack)
    rows = []
    for i, thh in enumerate(thhs):
        rc_dec = os.path.join(args.workdir, f"rc_dec_{thh}.ply")
        stage(f"decode thh{thh}", ["decode", pack, "--recon", rc_dec, "--thh", thh])
        b = read_ply_points(rc_dec)
        if i == 0:
            a = read_ply_points(rc_enc)
            if not (a.shape == b.shape and np.array_equal(a, b)):
                raise SystemExit("PARITY FAIL")
        rec = np.rint(b).astype(np.int64)
        m = d1_psnr(src, rec, depth=DEPTH, platform=None)
        m2 = d2_psnr(src, rec, depth=DEPTH, platform=None)
        rows.append({
            "thh": float(thh),
            "bpp_gross": round(8.0 * os.path.getsize(pack) / n, 4),
            "b_latent": round(8.0 * len(pk["latent_pack"]["stream"]) / n, 4),
            "b_net": round(8.0 * len(pk["net_weight_pack"]["bit_stream"]) / n, 4),
            "d1_psnr": round(float(m["psnr"]), 4),
            "d2_psnr": round(float(m2["psnr"]), 4),
            "n_points_rec": int(len(b)),
        })
        print("[e3] ROW " + json.dumps(rows[-1]), flush=True)
    out = {
        "what": "vox10 ctx co-train, feature-init predictor (ctx_train_init=feature)",
        "lambda": 200.0, "epochs": args.epochs, "parity": True,
        "entropy_mode": pk["model"]["entropy_mode"],
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("[e3] wrote " + args.out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
