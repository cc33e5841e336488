"""Round-4 payload-efficient wide-predictor experiment (VERDICT item 6).

Round 3's capacity sweep (results/round3/ctx_capacity_sweep.json) showed the
h32 post-hoc fit codes BELOW the linear-conditional bound (3.5322 b/sym vs
OLS 3.57) but loses on total bits because its 22.9k-bit payload more than
cancels the stream gain — and that payload is dominated by ctx2's 13
spatial taps x hidden x 2ch. This driver measures whether the `ctx_tail`
parameterization (models/decoder.py: extra hidden units readable only
through the channel-gated CENTER ctx2 tap, ~1/7 the coded taps per unit)
keeps the nonlinear stream gain at ~h16 payload.

Unlike the round-3 sweep (float bit estimates), every candidate here is
measured with REAL coded bits: the fitted kernels are quantized to the 1/16
grid, packed into the actual ctx payload, and the latents are coded through
the exact fixed-point host coder (encode->decode round-trip asserted).

Usage: python scripts/r4_ctx_capacity2.py --ckpt /path/to/v11_ctx_ckpts \
           [--candidates h16,h32,h32t16,h32t24] [--early_stop 0]
           [--out results/round4/ctx_capacity2.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> (ctx_hidden, ctx_tail)
CANDIDATES = {
    "h8": (8, 0),
    "h16": (16, 0),
    "h32": (32, 0),
    "h32t16": (32, 16),
    "h32t24": (32, 24),
    "h48t40": (48, 40),
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="trained checkpoint file or dir")
    ap.add_argument("--candidates", default="h16,h32,h32t16,h32t24")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument(
        "--early_stop", type=float, default=0.0,
        help="0 = exhaustive fits (the round-3 sweep's decision setting)",
    )
    ap.add_argument("--backend", default="", help="fit device ('' = session default)")
    ap.add_argument("--n_points", type=int, default=3_499_652,
                    help="bpp denominator (default: the vox11 sphere)")
    ap.add_argument(
        "--with_baselines", action="store_true",
        help="also measure the no-upgrade alternatives: 'marginal' (a "
        "moment-fitted per-channel Gaussian pack) and 'ckpt' (the "
        "checkpoint's own co-trained predictor, no fit) — the rates the "
        "CTX_POST_ECONOMICS gate compares candidates against",
    )
    ap.add_argument("--out", default="results/round4/ctx_capacity2.json")
    args = ap.parse_args()

    from nvfpcc_tpu.codec import weights as W
    from nvfpcc_tpu.coder import ctx_coder as CTX
    from nvfpcc_tpu.models import decoder as M
    from nvfpcc_tpu.train import ctx_fit
    from nvfpcc_tpu.utils import checkpoint as C
    from nvfpcc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    path = args.ckpt
    if os.path.isdir(path):
        path = C.latest_checkpoint(path)
    params, emb, meta = C.load_checkpoint_meta(path)
    meta = meta or {}
    ch = int(meta.get("ch", 3))
    chanstr = str(meta.get("chanstr", "8,16,8,8"))
    channels = tuple(int(c) for c in chanstr.split(","))
    seed_tag = str(meta.get("seed_tag", "nvfpcc-tpu/seed-stream/v1"))
    src_mode = str(meta.get("entropy_mode", "channel"))
    base_spec = M.build_model_spec(
        ch, channels, seed_tag,
        src_mode if src_mode in M.CTX_MODES else "channel",
        ctx_hidden=int(meta.get("ctx_hidden", M.CTX_HIDDEN)),
    )
    lat_int = ctx_fit.latents_from_checkpoint(base_spec, params, np.asarray(emb))
    n_sym = int(np.prod(lat_int.shape))
    print(f"[cap2] {lat_int.shape[0]} blocks, {n_sym} symbols from {path}", flush=True)

    results = {}
    out_partial = args.out + ".partial"

    def emit(name, row):
        results[name] = row
        print(f"[cap2] {name}: " + json.dumps(row), flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(out_partial, "w") as f:
            json.dump(results, f, indent=1)

    if args.with_baselines:
        # "marginal": the per-channel Gaussian alternative (a channel-mode
        # latent pack from moment-fitted f32 params — the cheapest possible
        # side info), the round-3 economics table's reference rate.
        from nvfpcc_tpu.coder import range_coder as RC

        ch = lat_int.shape[-1]
        flat = lat_int.reshape(-1, ch).astype(np.float64)
        sigma = np.maximum(flat.std(axis=0), 1e-3).astype(np.float32)
        mu = flat.mean(axis=0).astype(np.float32)
        lpack = RC.encode_latents(lat_int.astype(np.float32), sigma, mu)
        sbits = 8 * len(lpack["stream"])
        pbits = 2 * ch * 32
        emit("marginal", {
            "coded_b_per_sym": round(sbits / n_sym, 4),
            "stream_bits": sbits, "payload_bits": pbits,
            "total_bits": sbits + pbits,
            "latent_bpp_incl_payload": round((sbits + pbits) / args.n_points, 5),
        })
        # "ckpt": the checkpoint's own co-trained predictor, unfitted — the
        # no-upgrade pack the economics gate compares against.
        if src_mode in M.CTX_MODES:
            qtree = W.quantize_residuals(params, 16)
            payload = CTX.build_ctx_payload(base_spec, qtree["entropy"], qp=16)
            ints = CTX.ctx_ints_from_payload(base_spec, payload)
            c_ar = src_mode == "ctx_ar"
            enc = CTX.encode_latents_ctx(lat_int, ints, channel_ar=c_ar)
            dec = CTX.decode_latents_ctx(enc["stream"], enc["shape"], ints, channel_ar=c_ar)
            assert np.array_equal(dec, enc["coded"]), "ckpt round-trip failed"
            sbits = 8 * len(enc["stream"])
            pbits = int(CTX.ctx_payload_bits(payload))
            emit("ckpt", {
                "mode": src_mode,
                "coded_b_per_sym": round(sbits / n_sym, 4),
                "stream_bits": sbits, "payload_bits": pbits,
                "total_bits": sbits + pbits,
                "latent_bpp_incl_payload": round((sbits + pbits) / args.n_points, 5),
                "n_clamped": int(enc["n_clamped"]),
            })

    for name in args.candidates.split(","):
        name = name.strip()
        hidden, tail = CANDIDATES[name]
        spec = M.build_model_spec(
            ch, channels, seed_tag, "ctx_ar", ctx_hidden=hidden, ctx_tail=tail
        )
        t0 = time.perf_counter()
        ep = ctx_fit.fit_ctx_predictor(
            spec, lat_int,
            wrate=params["decoder"].get("wrate"),
            steps=args.steps,
            early_stop=args.early_stop,
            backend=args.backend or None,
        )
        fit_s = time.perf_counter() - t0
        # REAL coded bits: quantize -> payload -> exact host coder round-trip
        qtree = W.quantize_residuals({**params, "entropy": ep}, 16)
        payload = CTX.build_ctx_payload(spec, qtree["entropy"], qp=16)
        payload_bits = CTX.ctx_payload_bits(payload)
        ints = CTX.ctx_ints_from_payload(spec, payload)
        enc = CTX.encode_latents_ctx(lat_int, ints, channel_ar=True)
        dec = CTX.decode_latents_ctx(enc["stream"], enc["shape"], ints, channel_ar=True)
        assert np.array_equal(dec, enc["coded"]), f"round-trip failed for {name}"
        stream_bits = 8 * len(enc["stream"])
        n_taps = sum(
            len(spec.specs[k].mask_flat_indices) for k in M.CTX_KERNELS
        )
        row = {
            "hidden": hidden, "tail": tail,
            "fit_s": round(fit_s, 1),
            "coded_b_per_sym": round(stream_bits / n_sym, 4),
            "stream_bits": stream_bits,
            "payload_bits": int(payload_bits),
            "coded_taps": int(n_taps),
            "total_bits": stream_bits + int(payload_bits),
            "latent_bpp_incl_payload": round(
                (stream_bits + payload_bits) / args.n_points, 5
            ),
            "n_clamped": int(enc["n_clamped"]),
        }
        emit(name, row)
    os.replace(out_partial, args.out)
    print("[cap2] wrote " + args.out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
