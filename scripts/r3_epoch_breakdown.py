"""Round-3 epoch-time breakdown at the flagship bench configuration.

The bench headline is the steady-state train-epoch wall-clock (917 blocks,
B=16, 61 scanned net updates + the full-set embedding update, 10 epochs per
dispatch). This probe splits that number into its two halves and bounds what
a lower-precision compute path could buy, WITHOUT changing the product:

  A. full epoch program (the bench program)           -> baseline ms/epoch
  B. batch-scan-only program (emb update removed)     -> scan ms/epoch
  C. emb-update-only program (scan removed)           -> update ms/epoch
  D. everything cast to bf16 (params/opt/emb/grids)   -> speed bound only;
     NOT a trainable configuration (optimizer state in bf16 diverges), just
     the ceiling for a mixed-precision design. (Known failure: the q-noise
     jax.random.uniform refuses bf16 — kept for the record, best-effort.)
  E. the SHIPPED mixed-precision path (TrainConfig.compute_dtype="bf16"):
     f32 master params/optimizer/rate/loss, bf16 decoder-conv arithmetic
     forward+backward -> the real product number.

Timing rule (CLAUDE.md): fetch a scalar to host to synchronize — under the
axon tunnel ``block_until_ready`` does not reliably wait.

Usage: python scripts/r3_epoch_breakdown.py [--chunks 3] [--k 10]
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
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--k", type=int, default=10, help="epochs per dispatch")
    ap.add_argument("--out", default="results/round3/epoch_breakdown.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from bench import N_BLOCKS, synthetic_flagship_grids
    from nvfpcc_tpu.config import ModelConfig, TrainConfig
    from nvfpcc_tpu.models import decoder as M
    from nvfpcc_tpu.train import loop as T
    from nvfpcc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    gt, dist = synthetic_flagship_grids()
    mcfg = ModelConfig()
    cfg = TrainConfig(batch_size=16)
    spec = M.build_model_spec(mcfg.ch, mcfg.channels, mcfg.seed_tag)
    params = M.init_params(spec)
    emb = M.init_embeddings(N_BLOCKS, mcfg.ch)
    steps_per_epoch = -(-N_BLOCKS // cfg.batch_size)
    net_opt, emb_opt = T.make_optimizers(cfg, steps_per_epoch)
    opt_state = net_opt.init(params)
    emb_opt_state = emb_opt.init(emb)
    n_total_pts = float(gt.sum())
    gt_d, dist_d = T._prep_dense(gt, dist)
    block_valid = jnp.ones((N_BLOCKS,), jnp.float32)

    idx, mask = T.batch_plan(N_BLOCKS, cfg.batch_size, cfg.shuffle, cfg.seed, 0)
    k = args.k
    idx_d = jnp.asarray(np.broadcast_to(idx, (k,) + idx.shape))
    mask_d = jnp.asarray(np.broadcast_to(mask, (k,) + mask.shape))
    base_key = jax.random.PRNGKey(0)
    epoch_nums = jnp.arange(k, dtype=jnp.int32)
    rd_w = T.rd_weights(cfg)

    def sync(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0].reshape(-1)[:1])

    def timed(fn, state):
        state = fn(state)  # warm / compile
        sync(state)
        t0 = time.perf_counter()
        for _ in range(args.chunks):
            state = fn(state)
        sync(state)
        return (time.perf_counter() - t0) / (args.chunks * k) * 1000.0

    one_epoch = T._epoch_body(spec, cfg, net_opt, emb_opt, n_total_pts, q=2)

    def make_variant(do_scan: bool, do_update: bool):
        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def prog(params, opt_state, emb, emb_opt_state, gt, dist, idx, mask,
                 block_valid, base_key, epoch_nums, rd_w):
            def body(carry, xs):
                params, opt_state, emb, emb_opt_state = carry
                e_idx, e_mask, e_num = xs
                key = jax.random.fold_in(base_key, e_num)
                if do_scan and do_update:
                    params, opt_state, emb, emb_opt_state, _ = one_epoch(
                        params, opt_state, emb, emb_opt_state, gt, dist, e_idx,
                        e_mask, block_valid, key, rd_w)
                elif do_scan:
                    # scan only: run the batch loop, skip the emb update
                    n_batches = e_idx.shape[0]
                    keys = jax.random.split(key, n_batches)

                    def net_loss(p, emb_b, gt_b, dist_b, m, kk, w):
                        return T.rd_loss(spec, cfg, p, jax.lax.stop_gradient(emb_b),
                                         gt_b, dist_b, m, n_total_pts, "train", 2,
                                         kk, w)

                    def batch_step(c, xs):
                        p, o = c
                        bidx, bmask, bkey = xs
                        (_, mtr), grads = jax.value_and_grad(net_loss, has_aux=True)(
                            p, emb[bidx], gt[bidx], dist[bidx], bmask, bkey, rd_w)
                        upd, o = net_opt.update(grads, o, p)
                        return (optax.apply_updates(p, upd), o), mtr["loss"]

                    (params, opt_state), _ = jax.lax.scan(
                        batch_step, (params, opt_state), (e_idx, e_mask, keys))
                else:
                    # emb update only
                    def emb_loss(e, p, g, d, bv, kk, w):
                        loss, _ = T.rd_loss(spec, cfg, jax.lax.stop_gradient(p), e,
                                            g, d, bv, n_total_pts, "train", 2, kk, w)
                        return loss

                    eg = jax.grad(emb_loss)(emb, params, gt, dist, block_valid,
                                            key, rd_w)
                    upd, emb_opt_state = emb_opt.update(eg, emb_opt_state, emb)
                    emb = optax.apply_updates(emb, upd)
                return (params, opt_state, emb, emb_opt_state), e_num

            carry, _ = jax.lax.scan(
                body, (params, opt_state, emb, emb_opt_state),
                (idx, mask, epoch_nums))
            return carry

        def run(state):
            return prog(*state, gt_d, dist_d, idx_d, mask_d, block_valid,
                        base_key, epoch_nums, rd_w)

        return run

    fresh = lambda: (M.init_params(spec), net_opt.init(M.init_params(spec)),
                     M.init_embeddings(N_BLOCKS, mcfg.ch),
                     emb_opt.init(M.init_embeddings(N_BLOCKS, mcfg.ch)))

    results = {}
    results["full_epoch_ms"] = timed(make_variant(True, True), fresh())
    print(f"[breakdown] full epoch: {results['full_epoch_ms']:.1f} ms", flush=True)
    results["scan_only_ms"] = timed(make_variant(True, False), fresh())
    print(f"[breakdown] scan only:  {results['scan_only_ms']:.1f} ms", flush=True)
    results["emb_update_only_ms"] = timed(make_variant(False, True), fresh())
    print(f"[breakdown] emb update: {results['emb_update_only_ms']:.1f} ms", flush=True)

    # D: the bf16 speed bound — cast EVERYTHING (incl. optimizer state; not a
    # trainable config) and run the same full-epoch program in bf16. The
    # seeded-init buffers live in the static spec, so a bf16 TWIN spec is
    # needed or the f32 inits would promote every conv back to f32
    # (codec/codec.py solves the same problem for the decode path).
    from nvfpcc_tpu.codec.codec import _bf16_twin_spec

    spec16 = _bf16_twin_spec(spec)
    one_epoch16 = T._epoch_body(spec16, cfg, net_opt, emb_opt, n_total_pts, q=2)
    to_bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x, t)
    gt_b16, dist_b16 = to_bf16((gt_d, dist_d))
    bv16 = block_valid.astype(jnp.bfloat16)
    rd16 = rd_w.astype(jnp.bfloat16)
    mask16 = mask_d.astype(jnp.bfloat16)
    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def prog16(params, opt_state, emb, emb_opt_state):
        def body(carry, xs):
            p, o, e, eo = carry
            e_idx, e_mask, e_num = xs
            key = jax.random.fold_in(base_key, e_num)
            p, o, e, eo, _ = one_epoch16(p, o, e, eo, gt_b16, dist_b16, e_idx,
                                         e_mask, bv16, key, rd16)
            return (p, o, e, eo), e_num

        carry, _ = jax.lax.scan(body, (params, opt_state, emb, emb_opt_state),
                                (idx_d, mask16, epoch_nums))
        return carry

    def run16(state):
        return prog16(*state)

    try:
        state16 = to_bf16(fresh())
        results["bf16_full_epoch_ms"] = timed(run16, state16)
        print(f"[breakdown] bf16 bound: {results['bf16_full_epoch_ms']:.1f} ms",
              flush=True)
    except Exception as exc:  # bf16 probe is best-effort
        results["bf16_full_epoch_ms"] = None
        results["bf16_error"] = repr(exc)
        print(f"[breakdown] bf16 probe failed: {exc!r}", flush=True)

    # E: the shipped mixed-precision path — same state dtypes as A (all f32),
    # only the conv arithmetic runs bf16 (TrainConfig.compute_dtype).
    cfg_mp = TrainConfig(batch_size=16, compute_dtype="bf16")
    one_epoch_mp = T._epoch_body(spec, cfg_mp, net_opt, emb_opt, n_total_pts, q=2)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def prog_mp(params, opt_state, emb, emb_opt_state):
        def body(carry, xs):
            p, o, e, eo = carry
            e_idx, e_mask, e_num = xs
            key = jax.random.fold_in(base_key, e_num)
            p, o, e, eo, _ = one_epoch_mp(p, o, e, eo, gt_d, dist_d, e_idx,
                                          e_mask, block_valid, key, rd_w)
            return (p, o, e, eo), e_num

        carry, _ = jax.lax.scan(body, (params, opt_state, emb, emb_opt_state),
                                (idx_d, mask_d, epoch_nums))
        return carry

    results["mixed_precision_epoch_ms"] = timed(lambda s: prog_mp(*s), fresh())
    print(f"[breakdown] mixed precision (shipped bf16 path): "
          f"{results['mixed_precision_epoch_ms']:.1f} ms", flush=True)

    results["device"] = str(jax.devices()[0])
    results["k_epochs_per_dispatch"] = k
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
