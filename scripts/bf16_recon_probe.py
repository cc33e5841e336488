"""Measure bf16 vs f32 reconstruction on the real chip.

The decode chain is compute-bound on the MXU at the low utilization its
8-channel layers permit (RESULTS.md round-2 analysis): f32 convs emulate on
the bf16 systolic array at ~1/4 rate, so casting the decode forward to
bfloat16 is the one cheap multiplier available. This probe times both paths
at flagship scale and reports how many thresholded voxels flip (parity is
unaffected either way — encoder and decoder run the same program — but the
reconstruction itself changes slightly, so bf16 is an explicit opt-in,
recorded in the pack).

Usage: python scripts/bf16_recon_probe.py [--blocks 964] [--ckpt dir]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--blocks", type=int, default=964)
    ap.add_argument("--ckpt", default=None, help="trained checkpoint dir/file")
    ap.add_argument("--thh", type=float, default=0.65)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nvfpcc_tpu.models import decoder as M
    from nvfpcc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    spec = M.build_model_spec(ch=3, channels=(8, 16, 8, 8))
    if args.ckpt:
        from nvfpcc_tpu.utils import checkpoint as C

        path = args.ckpt
        if os.path.isdir(path):
            path = C.latest_checkpoint(path)
        params, emb = C.load_checkpoint(path)
        code = jax.jit(lambda p, e: M.get_latent_code(spec, p, e))(
            params, jnp.asarray(emb, jnp.float32)
        )
        latents = np.rint(np.asarray(code["quantized_latent"])).astype(np.float32)
        n = latents.shape[0]
    else:
        rng = np.random.default_rng(0)
        params = M.init_params(spec)
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jnp.asarray(rng.normal(0, 1, a.shape), a.dtype), params
        )
        latents = np.rint(rng.normal(0, 6, (args.blocks, 2, 2, 2, 3))).astype(np.float32)
        n = args.blocks

    def cast_tree(t, dt):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt) if hasattr(x, "astype") else x, t
        )

    # the seeded init buffers live in the (frozen) spec, not the params tree —
    # build a bf16-init twin spec so the conv sees uniformly-bf16 operands
    import dataclasses

    import ml_dtypes

    bf16_specs = {
        name: dataclasses.replace(
            s,
            kernel_init=np.asarray(s.kernel_init, ml_dtypes.bfloat16),
            b_init=None if s.b_init is None else np.asarray(s.b_init, ml_dtypes.bfloat16),
        )
        for name, s in spec.specs.items()
    }
    spec16 = dataclasses.replace(spec, specs=bf16_specs)

    fns = {}
    fns["f32"] = jax.jit(lambda p, l: M.reconstruct(spec, p, l, q=2))
    fns["bf16"] = jax.jit(
        lambda p, l: M.reconstruct(
            spec16, cast_tree(p, jnp.bfloat16), l.astype(jnp.bfloat16), q=2
        )
    )

    lat_d = jnp.asarray(latents)
    results = {}
    for name, fn in fns.items():
        out = fn(params, lat_d)
        np.asarray(out[0, 0, 0, 0])  # sync (block_until_ready unreliable on axon)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(params, lat_d)
        np.asarray(out[0, 0, 0, 0])
        ms = (time.perf_counter() - t0) / args.reps * 1000.0
        results[name] = (ms, np.asarray(out, np.float32))
        print(f"{name}: {ms:.1f} ms for {n} blocks ({n / ms * 1000:.0f} blocks/s)")

    occ32 = results["f32"][1] > args.thh
    occ16 = results["bf16"][1] > args.thh
    flips = int(np.logical_xor(occ32, occ16).sum())
    total = int(occ32.sum())
    print(
        f"speedup {results['f32'][0] / results['bf16'][0]:.2f}x | thresholded "
        f"voxels f32 {total}, flips under bf16 {flips} ({flips / max(total,1) * 100:.4f}%)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
