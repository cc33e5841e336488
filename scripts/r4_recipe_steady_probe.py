"""Round-4 recipe speed table: steady-state ms/epoch across (batch, dtype).

The batch-recipe A/B (``scripts/r4_batch_recipe.py``) measures each arm's
steady epoch once, at whatever host load that moment has — fine within one
arm, useless for cross-arm RATIOS (the round-3 b16 bench number is 498 ms;
the same measurement inside the contended A/B session read 708 ms). This
probe measures every candidate (batch, compute_dtype) back-to-back in ONE
process with interleaved passes so all arms share weather, exactly like
``r4_mp_steady_probe.py`` did for the dtype pair. The best-of-passes value
is the decision number for the production-recipe flip (RESULTS.md round 4).

Usage: python scripts/r4_recipe_steady_probe.py \
           [--arms 16:f32,16:bf16,32:f32,32:bf16,64:f32,64:bf16] \
           [--chunks 5] [--repeats 2] [--out results/round4/recipe_steady.json]
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
        # scalar fetch: block_until_ready is unreliable under axon (CLAUDE.md)
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
    ap.add_argument("--arms", default="16:f32,16:bf16,32:f32,32:bf16,64:f32,64:bf16")
    ap.add_argument("--chunks", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=2,
                    help="interleaved passes over all arms (weather control)")
    ap.add_argument("--out", default="results/round4/recipe_steady.json")
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

    arms = []
    for a in args.arms.split(","):
        b, dt = a.strip().split(":")
        arms.append((int(b), dt))
    out = {"chunks_of_10": args.chunks, "passes": {}}
    for r in range(args.repeats):
        for b, dt in arms:
            tag = f"b{b}_{dt}"
            ms = measure(art, b, dt, args.chunks)
            out["passes"].setdefault(tag, []).append(round(ms, 2))
            print(f"[steady] pass {r} {tag}: {ms:.1f} ms/epoch", flush=True)
    for tag, vals in out["passes"].items():
        out[tag + "_ms_best"] = min(vals)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("[steady] wrote " + args.out, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
