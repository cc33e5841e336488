"""Round-3 multi-sequence validation of the production `auto` recipe.

Round 2 measured torus/helix (vox10 scale) in channel mode only (RESULTS.md
"Multi-sequence" table: torus 0.1988 bpp / 71.89 dB, helix 0.1719 / 71.98);
the vox10 ctx-dominance claim ("-3.8% rate AND +0.33 dB") rests on one sphere
A/B. This driver replicates the recipe on the other two geometries: generate
the cloud, train with `--entropy_mode auto` (level 5 -> co-trained ctx),
encode (auto keeps the checkpoint's ctx model at level 5), decode at several
thresholds, parity-gate, true D1. One process, warm caches, real TPU.

Usage: python scripts/r3_multiseq_auto.py --shapes torus,helix \
           --workdir /tmp/r3multiseq [--epochs 501] [--thhs 0.60,0.65,0.70]
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
    ap.add_argument("--shapes", default="torus,helix")
    ap.add_argument("--thhs", default="0.60,0.65,0.70")
    ap.add_argument("--epochs", type=int, default=501)
    ap.add_argument("--workdir", default="/tmp/r3multiseq")
    ap.add_argument("--out_dir", default="results/round3")
    ap.add_argument(
        "--entropy_mode", default="auto",
        help="override the recipe's entropy mode (e.g. 'channel' for the "
        "strict same-driver A/B against the auto recipe)",
    )
    ap.add_argument(
        "--tag", default="auto",
        help="artifact-name tag: writes multiseq_{tag}_{shape}.json",
    )
    args = ap.parse_args()

    from nvfpcc_tpu.cli import main as cli_main
    from nvfpcc_tpu.io.ply import read_ply_points, write_ply_points
    from nvfpcc_tpu.metrics import d1_psnr, d2_psnr
    from nvfpcc_tpu.utils.cache import enable_compilation_cache
    from scripts.synth_cloud import SHAPES

    enable_compilation_cache()
    os.makedirs(args.out_dir, exist_ok=True)
    common = ["--depth", str(DEPTH), "--level", str(LEVEL)]

    def stage(name, argv):
        t0 = time.perf_counter()
        rc = cli_main(argv)
        dt = time.perf_counter() - t0
        print(f"[multiseq] {name}: {dt:.1f}s (rc={rc})", flush=True)
        if rc:
            raise SystemExit(f"{name} failed with status {rc}")
        return dt

    for shape in args.shapes.split(","):
        shape = shape.strip()
        cloud = f"/tmp/{shape}_vox10.ply"
        if not os.path.exists(cloud):
            # the round-2 clouds: default radius/samples/seed of synth_cloud
            pts = SHAPES[shape](DEPTH)
            write_ply_points(cloud, pts)
            print(f"[multiseq] {shape}: {len(pts)} pts", flush=True)
        src = np.rint(read_ply_points(cloud)).astype(np.int64)
        n = len(src)
        work = os.path.join(args.workdir, shape)
        ckpts = os.path.join(work, "ckpts")
        os.makedirs(work, exist_ok=True)
        if not os.path.exists(os.path.join(ckpts, f"{args.epochs - 1:04d}.npz")):
            stage(f"train {shape}", [
                "train", cloud, *common,
                "--entropy_mode", args.entropy_mode,
                "--epochs", str(args.epochs), "--checkpoint_dir", ckpts,
                "--resume",  # pick up where a tunnel-interrupted run stopped
            ])
        thhs = [t.strip() for t in args.thhs.split(",")]
        pack = os.path.join(work, "pack.pk")
        rc_enc = os.path.join(work, "rc_enc.ply")
        stage(f"encode {shape}", [
            "encode", cloud, *common, "--load_checkpoint", ckpts,
            "--pack_fn", pack, "--recon", rc_enc, "--thh", thhs[0],
        ])
        from nvfpcc_tpu import codec as _codec
        pk = _codec.load_pack(pack)
        rows = []
        for i, thh in enumerate(thhs):
            rc_dec = os.path.join(work, f"rc_dec_{thh}.ply")
            stage(f"decode {shape} thh{thh}",
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
                "shape": shape, "thh": float(thh),
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
            }
            rows.append(row)
            print("[multiseq] ROW " + json.dumps(row), flush=True)
        out = os.path.join(args.out_dir, f"multiseq_{args.tag}_{shape}.json")
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"[multiseq] wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
