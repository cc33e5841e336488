"""Encode+decode+parity+D1 from an existing checkpoint (no retraining).

Usage: python scripts/encode_eval.py cloud.ply --ckpt DIR --entropy_mode M
       [--depth 10 --level 5 --thh 0.65] [--out stats.json]
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
    ap.add_argument("cloud")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--entropy_mode", default="channel")
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--level", type=int, default=5)
    ap.add_argument("--thh", type=float, default=0.65)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from nvfpcc_tpu.cli import main as cli_main
    from nvfpcc_tpu.io.ply import read_ply_points
    from nvfpcc_tpu.metrics import d1_psnr
    from nvfpcc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    work = os.path.dirname(os.path.abspath(args.ckpt.rstrip("/")))
    pack = os.path.join(work, "pack.pk")
    rc_enc = os.path.join(work, "rc_enc.ply")
    rc_dec = os.path.join(work, "rc_dec.ply")
    common = ["--depth", str(args.depth), "--level", str(args.level)]
    stats = {}
    t0 = time.perf_counter()
    cli_main(["encode", args.cloud, *common, "--load_checkpoint", args.ckpt,
              "--entropy_mode", args.entropy_mode, "--pack_fn", pack,
              "--recon", rc_enc, "--thh", str(args.thh)])
    stats["encode_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    cli_main(["decode", pack, "--recon", rc_dec])
    stats["decode_s"] = round(time.perf_counter() - t0, 2)
    a, b = read_ply_points(rc_enc), read_ply_points(rc_dec)
    stats["parity"] = a.shape == b.shape and bool(np.array_equal(a, b))
    stats["n_points_rec"] = int(len(b))
    src = np.rint(read_ply_points(args.cloud)).astype(np.int64)
    m = d1_psnr(src, np.rint(b).astype(np.int64), depth=args.depth, platform=None)
    stats["d1_psnr"] = round(float(m["psnr"]), 4)
    stats["pack_bytes"] = os.path.getsize(pack)
    stats["bpp"] = round(8.0 * stats["pack_bytes"] / len(src), 4)
    stats["entropy_mode"] = args.entropy_mode
    line = json.dumps(stats)
    print(line, flush=True)
    if args.out:
        open(args.out, "w").write(line + "\n")
    return 0 if stats["parity"] else 1


if __name__ == "__main__":
    sys.exit(main())
