"""Generate tiny golden packs for every retired format version (v1-v3).

``codec.PACK_FORMAT_VERSION`` is 4 and ``codec.decode`` promises v1-v3 stay
decodable forever (codec/codec.py:48-49) — the reference's format stability
is a product contract (its ``pack.pk`` layout never versioned at all,
``NVFPCC.py:486-493``). Until round 5 that promise was code-inspection-only;
these fixtures pin it with bytes on disk:

  tests/fixtures/packs/pack_v{1,2,3}.pk   the packs (restricted-unpickler safe)
  tests/fixtures/packs/golden_v{1,2,3}.npz  origins / latents / kernels to match

Each pack exercises the dispatch paths that distinguish its version:
  v1: raw int16 origins, huffman weights WITHOUT a "mode" key, channel
      latents WITHOUT a "mode" key (all the absent-key defaults).
  v2: octree-coded origins, huffman weights (explicit mode), spatio latents.
  v3: octree origins, global-histogram range weights ("range"), ctx latent
      pack WITHOUT the payload "qp" key (absent = 16, the older-v3 layout).

Everything is host-deterministic (seeded rng + integer/host coding), so the
golden arrays are exact forever; the reconstruction check in the test
compares decode() against a live reconstruct on the same arrays instead of
baking float points (XLA numerics may legitimately drift across versions).

Usage: python scripts/make_pack_fixtures.py [--outdir tests/fixtures/packs]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTH, LEVEL, QP = 7, 2, 16
CH, CHANSTR = 2, "4,8,4,4"


def _origins():
    from nvfpcc_tpu.octree import partition as OT

    pts = np.array([[0, 0, 0], [40, 8, 2], [70, 70, 70]], np.int64)
    return OT.leaf_origins(pts, DEPTH, LEVEL)


def _base(entropy_mode: str):
    """Deterministic (spec, quantized params, integer latents)."""
    from nvfpcc_tpu.codec import weights as W
    from nvfpcc_tpu.models import decoder as M

    spec = M.build_model_spec(
        CH, tuple(int(c) for c in CHANSTR.split(",")), entropy_mode=entropy_mode
    )
    params = M.init_params(spec)
    # perturb kernels off the seeded inits so residual streams are non-trivial
    rng = np.random.default_rng(7)
    dp = params["decoder"]
    for name in W.TRANSMITTED_KERNELS:
        k = np.asarray(dp[name]["kernel"])
        dp[name]["kernel"] = k + rng.integers(-3, 4, k.shape) / QP
    if entropy_mode in ("ctx", "ctx_ar"):
        for name in M.CTX_KERNELS:
            k = np.asarray(params["entropy"][name]["kernel"])
            params["entropy"][name]["kernel"] = k + rng.integers(-2, 3, k.shape) / QP
    qparams = W.quantize_residuals(params, QP)
    lat = rng.integers(-8, 9, (3, 2, 2, 2, CH)).astype(np.int64)
    return spec, qparams, lat


def _model_meta(entropy_mode: str) -> dict:
    from nvfpcc_tpu.utils import seeds

    return {
        "ch": CH,
        "chanstr": CHANSTR,
        "seed_tag": seeds.DEFAULT_TAG,
        "entropy_mode": entropy_mode,
    }


def _codec_meta() -> dict:
    return {
        "thh": 0.6,
        "qp": QP,
        "depth": DEPTH,
        "level": LEVEL,
        "n_points_src": 3,
    }


def _golden(path, origins, lat, qparams):
    from nvfpcc_tpu.codec import weights as W

    kernels = {
        f"kernel_{n}": np.asarray(qparams["decoder"][n]["kernel"], np.float32)
        for n in W.TRANSMITTED_KERNELS
    }
    np.savez(path, origins=origins, latents=lat, **kernels)


def make_v1(outdir: str) -> None:
    from nvfpcc_tpu import codec
    from nvfpcc_tpu.codec import weights as W
    from nvfpcc_tpu.coder import range_coder as RC

    spec, qparams, lat = _base("channel")
    origins = _origins()
    wpack = W.pack_weights(qparams, QP, entropy="huffman")
    del wpack["mode"]  # v1/v2 packs predate the key (absent = huffman)
    sigma = np.asarray(qparams["entropy"]["sigma"], np.float32)
    mu = np.asarray(qparams["entropy"]["mu"], np.float32)
    lpack = RC.encode_latents(lat.astype(np.float32), sigma, mu)
    pack = {
        "format_version": 1,
        "model": _model_meta("channel"),
        "codec": _codec_meta(),
        "net_weight_pack": wpack,
        "origins": np.asarray(origins, np.int16),  # v1: raw int16 (N, 3)
        "latent_pack": lpack,
    }
    codec.save_pack(os.path.join(outdir, "pack_v1.pk"), pack)
    _golden(os.path.join(outdir, "golden_v1.npz"), origins, lat, qparams)


def make_v2(outdir: str) -> None:
    from nvfpcc_tpu import codec
    from nvfpcc_tpu.codec import weights as W
    from nvfpcc_tpu.coder import range_coder as RC

    spec, qparams, lat = _base("spatio")
    origins = _origins()
    wpack = W.pack_weights(qparams, QP, entropy="huffman")
    sigma = np.asarray(qparams["entropy"]["sigma"], np.float32)
    mu = np.asarray(qparams["entropy"]["mu"], np.float32)
    lpack = RC.encode_latents(lat.astype(np.float32), sigma, mu)
    pack = {
        "format_version": 2,
        "model": _model_meta("spatio"),
        "codec": _codec_meta(),
        "net_weight_pack": wpack,
        "origins": codec.encode_origins(origins, DEPTH, LEVEL),
        "latent_pack": lpack,
    }
    codec.save_pack(os.path.join(outdir, "pack_v2.pk"), pack)
    _golden(os.path.join(outdir, "golden_v2.npz"), origins, lat, qparams)


def make_v3(outdir: str) -> None:
    from nvfpcc_tpu import codec
    from nvfpcc_tpu.codec import weights as W
    from nvfpcc_tpu.coder import ctx_coder as CTX

    spec, qparams, lat = _base("ctx")
    origins = _origins()
    wpack = W.pack_weights(qparams, QP, entropy="range")
    payload = CTX.build_ctx_payload(spec, qparams["entropy"], QP)
    del payload["qp"]  # older v3 layout: absent = 16
    ints = CTX.ctx_ints_from_payload(spec, payload)
    enc = CTX.encode_latents_ctx(lat, ints, channel_ar=False)
    assert not enc["n_clamped"]
    pack = {
        "format_version": 3,
        "model": {**_model_meta("ctx"), "ctx_hidden": 8},
        "codec": _codec_meta(),
        "net_weight_pack": wpack,
        "origins": codec.encode_origins(origins, DEPTH, LEVEL),
        "latent_pack": {
            "mode": "ctx",
            "stream": enc["stream"],
            "shape": enc["shape"],
            "ctx": payload,
        },
    }
    codec.save_pack(os.path.join(outdir, "pack_v3.pk"), pack)
    _golden(os.path.join(outdir, "golden_v3.npz"), origins, lat, qparams)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outdir", default="tests/fixtures/packs")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    make_v1(args.outdir)
    make_v2(args.outdir)
    make_v3(args.outdir)
    for f in sorted(os.listdir(args.outdir)):
        p = os.path.join(args.outdir, f)
        print(f"{f}: {os.path.getsize(p)} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
