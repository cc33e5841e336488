"""Round-4 large-batch training-recipe A/B: can a rescaled recipe cut the
epoch wall-clock >=1.5x at <=0.1 dB D1 / <=1% bpp vs the reference-faithful
B=16 anchor?

Context (RESULTS.md round 3): the epoch is 85% a *sequential* scan of
ceil(N/B) B=16 fwd+bwd+Adam steps at ~6.7 ms each — the chip is
utilization-starved, not FLOP-bound, so fewer/larger steps are the only
identified epoch-time lever. The round-2 same-recipe B=64 run lost 2 dB
(the extra small-batch optimizer steps buy real quality in the overfitting
regime), so each large-batch arm here rescales the NET learning rate
(sqrt/linear scaling) while holding the EMBEDDING lr constant at
lr*wemb = 5e-3 — the embedding update is once-per-epoch full-set
(reference ``NVFPCC.py:225-251``) and therefore independent of B, so its
dynamics must not change with the batch size.

Each arm: fresh 501-epoch train (same cloud, lambda=200, entropy mode fixed
across arms) -> encode -> decode at 3 thresholds -> parity + true D1/D2;
plus a bench-style steady-state epoch-ms measurement at that batch size
(same program, warm cache, scalar-fetch synchronized).

Usage: python scripts/r4_batch_recipe.py [--arms b16,b32_sqrt,...]
           [--workdir /tmp/r4batch] [--out results/round4/batch_recipe.json]
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

# tag -> (batch, lr, wemb, epochs, lambda); lr*wemb == 5e-3 everywhere
# (see docstring). lambda defaults to the recipe's 200; the *_l arms rescale
# it so the arm LANDS AT THE ANCHOR'S RATE — the fixed-lambda arms came back
# at +6..14% bpp (large-batch training shifts the RD operating point), so the
# equal-rate D1 comparison needs a lambda that cancels the shift
# (local slope from round-2 fs_ctx vs fs_ctx300: ~ -8.5% rate per +50% lambda).
ARMS = {
    "b16": (16, 1e-3, 5.0, 501, 200),  # the reference-faithful anchor
    "b32_sqrt": (32, 1.414e-3, 3.536, 501, 200),
    "b32_lin": (32, 2e-3, 2.5, 501, 200),
    "b64_sqrt": (64, 2e-3, 2.5, 501, 200),
    "b64_lin": (64, 4e-3, 1.25, 501, 200),
    "b32_sqrt_l265": (32, 1.414e-3, 3.536, 501, 265),
}


def measure_epoch_ms(gt, dist, batch_size: int, lr: float, wemb: float) -> float:
    """Steady-state ms/epoch at the production dispatch cadence (10 epochs
    per program), same methodology as bench.py: warm chunk, 3 timed chunks,
    scalar fetch to synchronize (block_until_ready is unreliable under the
    axon tunnel — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    from nvfpcc_tpu.config import ModelConfig, TrainConfig
    from nvfpcc_tpu.models import decoder as M
    from nvfpcc_tpu.train import loop as T

    n_blocks = gt.shape[0]
    mcfg = ModelConfig()
    cfg = TrainConfig(batch_size=batch_size, lr=lr, wemb=wemb)
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

    state = epochs_fn(*state, *args_tail)[:4]
    sync(state)
    t0 = time.perf_counter()
    chunks = 3
    for _ in range(chunks):
        state = epochs_fn(*state, *args_tail)[:4]
    sync(state)
    return (time.perf_counter() - t0) / (chunks * k) * 1000.0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--thhs", default="0.60,0.65,0.70")
    ap.add_argument("--entropy_mode", default="channel",
                    help="fixed across arms (the recipe question is "
                    "orthogonal to the entropy model)")
    ap.add_argument("--workdir", default="/tmp/r4batch")
    ap.add_argument("--out", default="results/round4/batch_recipe.json")
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
        print(f"[batch] sphere: {len(pts)} pts", flush=True)
    src = np.rint(read_ply_points(cloud)).astype(np.int64)
    n = len(src)
    common = ["--depth", str(DEPTH), "--level", str(LEVEL)]

    def stage(name, argv):
        t0 = time.perf_counter()
        rc = cli_main(argv)
        dt = time.perf_counter() - t0
        print(f"[batch] {name}: {dt:.1f}s (rc={rc})", flush=True)
        if rc:
            raise SystemExit(f"{name} failed with status {rc}")
        return dt

    # artifacts for the timing measurement (built once, shared)
    from nvfpcc_tpu.cli import load_or_build_artifacts

    art = load_or_build_artifacts(cloud, DEPTH, LEVEL, platform="device")

    out_partial = args.out + ".partial"
    results = {}
    # resume across invocations: prior arms live in the partial (interrupted
    # run) or in the finished output (follow-up arms added later)
    for prior in (args.out, out_partial):
        if os.path.exists(prior):
            with open(prior) as f:
                results.update(json.load(f))
    if results:
        print(f"[batch] preloaded arms: {sorted(results)}", flush=True)
    for tag in args.arms.split(","):
        tag = tag.strip()
        B, lr, wemb, epochs, lam = ARMS[tag]
        work = os.path.join(args.workdir, tag)
        ckpts = os.path.join(work, "ckpts")
        os.makedirs(work, exist_ok=True)
        train_s = None
        if not os.path.exists(os.path.join(ckpts, f"{epochs - 1:04d}.npz")):
            train_s = stage(f"train[{tag}]", [
                "train", cloud, *common, "--epochs", str(epochs),
                "--batchsize", str(B), "--lr", str(lr), "--wemb", str(wemb),
                "--lambda", str(lam),
                "--entropy_mode", args.entropy_mode,
                "--checkpoint_dir", ckpts, "--resume",
            ])
        epoch_ms = measure_epoch_ms(art["gt"], art["dist"], B, lr, wemb)
        print(f"[batch] {tag}: steady-state {epoch_ms:.1f} ms/epoch", flush=True)
        thhs = [t.strip() for t in args.thhs.split(",")]
        pack = os.path.join(work, "pack.pk")
        rc_enc = os.path.join(work, "rc_enc.ply")
        stage(f"encode[{tag}]", [
            "encode", cloud, *common, "--load_checkpoint", ckpts,
            "--pack_fn", pack, "--recon", rc_enc, "--thh", thhs[0],
        ])
        from nvfpcc_tpu import codec as _codec
        pk = _codec.load_pack(pack)
        rows = []
        for i, thh in enumerate(thhs):
            rc_dec = os.path.join(work, f"rc_dec_{thh}.ply")
            stage(f"decode[{tag}] thh{thh}",
                  ["decode", pack, "--recon", rc_dec, "--thh", thh])
            b = read_ply_points(rc_dec)
            if i == 0:
                a = read_ply_points(rc_enc)
                if not (a.shape == b.shape and np.array_equal(a, b)):
                    raise SystemExit(f"PARITY FAIL in arm {tag}")
            rec = np.rint(b).astype(np.int64)
            m = d1_psnr(src, rec, depth=DEPTH, platform=None)
            m2 = d2_psnr(src, rec, depth=DEPTH, platform=None)
            rows.append({
                "thh": float(thh),
                "bpp_gross": round(8.0 * os.path.getsize(pack) / n, 4),
                "b_latent": round(8.0 * len(pk["latent_pack"]["stream"]) / n, 4),
                "b_net": round(
                    8.0 * len(pk["net_weight_pack"]["bit_stream"]) / n, 4),
                "d1_psnr": round(float(m["psnr"]), 4),
                "d2_psnr": round(float(m2["psnr"]), 4),
                "n_points_rec": int(len(b)),
            })
            print(f"[batch] ROW {tag} " + json.dumps(rows[-1]), flush=True)
        results[tag] = {
            "batch": B, "lr": lr, "wemb": wemb, "epochs": epochs,
            "lambda": lam, "emb_lr": lr * wemb,
            "train_s_total": None if train_s is None else round(train_s, 1),
            "epoch_ms_steady": round(epoch_ms, 1),
            "parity": True,
            "rows": rows,
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(out_partial, "w") as f:
            json.dump(results, f, indent=1)
    os.replace(out_partial, args.out)
    print("[batch] wrote " + args.out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
