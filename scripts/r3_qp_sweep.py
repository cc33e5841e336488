"""Round-3 weight-quantization-grid (qp) RD sweep on a trained checkpoint.

The reference fixes qp=16 ("4-bit" residuals, README.md:41-43) and trains
with 1/16-grid STE rounding, but the encode-time grid is a free dial: the
pack carries qp (docs/FORMAT.md) and decode divides by it, so any grid
decodes — the question is the measured rate/distortion trade of coarser or
finer grids under weights trained FOR 1/16. One encode per qp from the same
checkpoint (recon + true D1 against the source), channel mode so the ctx
qp|16 constraint does not bind.

Usage: python scripts/r3_qp_sweep.py --cloud /tmp/fs_chan/sphere_vox10.ply \
           --ckpt /tmp/fs_chan/ckpts [--qps 8,12,16,24,32] [--thh 0.65]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cloud", default="/tmp/fs_chan/sphere_vox10.ply")
    ap.add_argument("--ckpt", default="/tmp/fs_chan/ckpts")
    ap.add_argument("--qps", default="8,12,16,24,32")
    ap.add_argument("--thh", type=float, default=0.65)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--level", type=int, default=5)
    ap.add_argument("--workdir", default="/tmp/r3qp")
    ap.add_argument("--out", default="results/round3/qp_sweep.json")
    ap.add_argument(
        "--platform", default=None,
        help="pin the jax platform (e.g. cpu to stay off the tunnel); "
        "stream bits are host-coded either way, D1/recon follow the device",
    )
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from nvfpcc_tpu.cli import main as cli_main
    from nvfpcc_tpu.io.ply import read_ply_points
    from nvfpcc_tpu.metrics import d1_psnr
    from nvfpcc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.workdir, exist_ok=True)
    src = np.rint(read_ply_points(args.cloud)).astype(np.int64)
    n = len(src)
    rows = []
    for qp_s in args.qps.split(","):
        qp = int(qp_s)
        pack = os.path.join(args.workdir, f"pack_q{qp}.pk")
        rc = os.path.join(args.workdir, f"rc_q{qp}.ply")
        t0 = time.perf_counter()
        status = cli_main([
            "encode", args.cloud, "--depth", str(args.depth),
            "--level", str(args.level), "--load_checkpoint", args.ckpt,
            "--pack_fn", pack, "--recon", rc, "--thh", str(args.thh),
            "--qp", str(qp),
            *(["--platform", args.platform] if args.platform else []),
        ])
        if status:
            raise SystemExit(f"encode qp={qp} failed with status {status}")
        dt = time.perf_counter() - t0
        from nvfpcc_tpu import codec as _codec

        pk = _codec.load_pack(pack)
        rec = np.rint(read_ply_points(rc)).astype(np.int64)
        m = d1_psnr(src, rec, depth=args.depth, platform=None)
        row = {
            "qp": qp,
            "bpp_gross": round(8.0 * os.path.getsize(pack) / n, 4),
            "b_net_stream": round(
                8.0 * len(pk["net_weight_pack"]["bit_stream"]) / n, 4
            ),
            "b_latent": round(8.0 * len(pk["latent_pack"]["stream"]) / n, 4),
            "weight_mode": pk["net_weight_pack"]["mode"],
            "d1_psnr": round(float(m["psnr"]), 4),
            "n_points_rec": int(len(rec)),
            "encode_s": round(dt, 1),
        }
        rows.append(row)
        print("[qp_sweep] ROW " + json.dumps(row), flush=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    print(f"[qp_sweep] wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
