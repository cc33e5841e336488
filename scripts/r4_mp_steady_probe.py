"""Round-4 follow-up to the mixed-precision A/B: steady-state epoch timing.

The full A/B (``scripts/r3_mixed_precision_ab.py`` ->
``results/round4/mixed_precision_ab.json``) measured the two arms' RD and
parity cleanly, but its train wall-clocks include each arm's FIRST COMPILES
under whatever tunnel weather the run hit (the bf16 arm's program was not in
the persistent cache; the f32 arm's was) — so `train_s_total` cannot decide
the speed question. This probe measures what bench.py measures: warm-cache
steady-state ms/epoch at the production dispatch cadence (10 epochs per
program call), one process, both dtypes back-to-back so they share weather,
scalar-fetch synchronized (``jax.block_until_ready`` is unreliable under the
axon tunnel — CLAUDE.md).

Usage: python scripts/r4_mp_steady_probe.py [--batch 16] [--chunks 5]
           [--out results/round4/mp_steady_epoch_ms.json]
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


def measure(art, batch_size: int, compute_dtype: str, chunks: int) -> float:
    import jax
    import jax.numpy as jnp

    from nvfpcc_tpu.config import ModelConfig, TrainConfig
    from nvfpcc_tpu.models import decoder as M
    from nvfpcc_tpu.train import loop as T

    gt, dist = art["gt"], art["dist"]
    n_blocks = gt.shape[0]
    mcfg = ModelConfig()
    cfg = TrainConfig(batch_size=batch_size, compute_dtype=compute_dtype)
    spec = M.build_model_spec(mcfg.ch, mcfg.channels, mcfg.seed_tag)
    params = M.init_params(spec)
    emb = M.init_embeddings(n_blocks, mcfg.ch)
    steps_per_epoch = -(-n_blocks // cfg.batch_size)
    net_opt, emb_opt = T.make_optimizers(cfg, steps_per_epoch)
    state = (params, net_opt.init(params), emb, emb_opt.init(emb))
    gt_d, dist_d = T._prep_dense(gt, dist)
    block_valid = jnp.ones((n_blocks,), jnp.float32)
    epochs_fn = T.make_epochs_fn(spec, cfg, net_opt, emb_opt, float(gt.sum()), q=2)
    idx, mask = T.batch_plan(n_blocks, cfg.batch_size, cfg.shuffle, cfg.seed, 0)
    k = 10
    idx_d = jnp.asarray(np.broadcast_to(idx, (k,) + idx.shape))
    mask_d = jnp.asarray(np.broadcast_to(mask, (k,) + mask.shape))
    args_tail = (
        gt_d, dist_d, idx_d, mask_d, block_valid, jax.random.PRNGKey(0),
        jnp.arange(k, dtype=jnp.int32), T.rd_weights(cfg),
    )

    def sync(s):
        np.asarray(jax.tree_util.tree_leaves(s)[0].reshape(-1)[:1])

    state = epochs_fn(*state, *args_tail)[:4]  # compile + warm
    sync(state)
    t0 = time.perf_counter()
    for _ in range(chunks):
        state = epochs_fn(*state, *args_tail)[:4]
    sync(state)
    return (time.perf_counter() - t0) / (chunks * k) * 1000.0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chunks", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=2,
                    help="f32/bf16 interleaved passes (weather control)")
    ap.add_argument("--out", default="results/round4/mp_steady_epoch_ms.json")
    args = ap.parse_args()

    from nvfpcc_tpu.cli import load_or_build_artifacts
    from nvfpcc_tpu.io.ply import write_ply_points
    from nvfpcc_tpu.utils.cache import enable_compilation_cache
    from scripts.synth_cloud import SHAPES

    enable_compilation_cache()
    cloud = "/tmp/sphere_vox10.ply"
    if not os.path.exists(cloud):
        write_ply_points(cloud, SHAPES["sphere"](DEPTH))
    art = load_or_build_artifacts(cloud, DEPTH, LEVEL, platform="device")

    out = {"batch": args.batch, "chunks_of_10": args.chunks, "passes": {}}
    for r in range(args.repeats):
        for dtype in ("f32", "bf16"):
            ms = measure(art, args.batch, dtype, args.chunks)
            out["passes"].setdefault(dtype, []).append(round(ms, 2))
            print(f"[mp-steady] pass {r} {dtype}: {ms:.1f} ms/epoch", flush=True)
    for dtype, vals in out["passes"].items():
        out[dtype + "_ms_best"] = min(vals)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("[mp-steady] wrote " + args.out, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
