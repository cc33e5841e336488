"""Round-3 probe: can a post-hoc ctx_ar predictor fit (ctx_post) rescue the
co-trained ctx packs on torus/helix at vox10 scale?

Context: the multiseq auto-recipe replication (RESULTS.md) found the fresh
ctx trains landing at +12-13% stream rate vs round-2 channel on torus and
helix. Before flipping the `auto` train default, measure the other half of
the decision: re-encode the SAME ctx checkpoints with `--ctx_post` (the fit
never touches the decoder, so D1 at each thh is bit-identical to the
already-measured auto rows — only the latent stream and predictor payload
change). If ctx+ctx_post still codes above the round-2 channel stream rate,
channel wins at vox10 scale outright.

Usage: python scripts/r3_multiseq_ctxpost_probe.py --shapes torus,helix \
           --workdir /tmp/r3multiseq [--thh 0.60]
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
    ap.add_argument("--thh", default="0.60")
    ap.add_argument("--workdir", default="/tmp/r3multiseq")
    ap.add_argument("--out_dir", default="results/round3")
    args = ap.parse_args()

    from nvfpcc_tpu import codec as _codec
    from nvfpcc_tpu.cli import main as cli_main
    from nvfpcc_tpu.io.ply import read_ply_points
    from nvfpcc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.out_dir, exist_ok=True)
    common = ["--depth", str(DEPTH), "--level", str(LEVEL)]

    def stage(name, argv):
        t0 = time.perf_counter()
        rc = cli_main(argv)
        dt = time.perf_counter() - t0
        print(f"[ctxpost-probe] {name}: {dt:.1f}s (rc={rc})", flush=True)
        if rc:
            raise SystemExit(f"{name} failed with status {rc}")
        return dt

    rows = []
    for shape in args.shapes.split(","):
        shape = shape.strip()
        cloud = f"/tmp/{shape}_vox10.ply"
        work = os.path.join(args.workdir, shape)
        ckpts = os.path.join(work, "ckpts")
        if not os.path.isdir(ckpts):
            raise SystemExit(f"no checkpoints at {ckpts} — run the auto "
                             "multiseq driver first")
        n = len(read_ply_points(cloud))
        pack = os.path.join(work, "pack_ctxpost.pk")
        rc_enc = os.path.join(work, "rc_enc_ctxpost.ply")
        stage(f"encode[{shape}] ctx_post", [
            "encode", cloud, *common, "--load_checkpoint", ckpts,
            "--entropy_mode", "ctx_ar", "--ctx_post", "--ctx_hidden", "16",
            "--pack_fn", pack, "--recon", rc_enc, "--thh", args.thh,
        ])
        pk = _codec.load_pack(pack)
        rc_dec = os.path.join(work, f"rc_dec_ctxpost_{args.thh}.ply")
        stage(f"decode[{shape}] ctx_post",
              ["decode", pack, "--recon", rc_dec, "--thh", args.thh])
        a = read_ply_points(rc_enc)
        b = read_ply_points(rc_dec)
        parity = a.shape == b.shape and bool(np.array_equal(a, b))
        if not parity:
            raise SystemExit(f"PARITY FAIL on {shape}")
        # D1 at this thh is identical to the auto row by construction
        # (ctx_post never touches the decoder); record rate only.
        row = {
            "shape": shape, "thh": float(args.thh),
            "bpp_gross": round(8.0 * os.path.getsize(pack) / n, 4),
            "b_latent": round(
                8.0 * len(pk["latent_pack"]["stream"]) / n, 4),
            "b_net": round(
                8.0 * len(pk["net_weight_pack"]["bit_stream"]) / n, 4),
            "parity": parity,
            "n_points_rec": int(len(b)),
            "entropy_mode": pk["model"]["entropy_mode"],
            "ctx_post": True,
        }
        rows.append(row)
        print("[ctxpost-probe] ROW " + json.dumps(row), flush=True)
    out = os.path.join(args.out_dir, "multiseq_ctxpost_probe.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[ctxpost-probe] wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
