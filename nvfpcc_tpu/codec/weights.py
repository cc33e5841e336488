"""Decoder-weight quantization and entropy packing.

Capability rebuild of the reference weight-compression pipeline
(``manipulate_weights.py`` + ``util_code_quantized_weights.py``):

- :func:`quantize_residuals` rounds the 7 transmitted kernel residuals to the
  1/qp grid on host (reference ``manipulate_weights.py:36-49``; qp=16 gives
  the README's "4-bit" residuals). Quantization happens on host float64 so
  the integers that enter the Huffman coder and the dequantized kernels the
  decoder rebuilds are bit-identical by construction.
- :func:`pack_weights` entropy-codes the integer residuals (default: one
  range-coded stream under per-kernel empirical histograms, with a
  global-histogram fallback when the tables don't pay — plus
  reference-style canonical Huffman and trained-Gaussian modes) and
  carries the small non-quantized remainder (biases, IGDN beta/gamma) as
  an fp32 as-is pool — the reference's ``as_is_pool``
  (``util_code_quantized_weights.py:150-156``). Unlike the reference we
  ship only what reconstruction needs: the training-only aux heads, the
  latent generator and the weight-rate model stay home (the reference
  ships aux params and loads ``strict=False``, ``NVFPCC.py:577-583``).
- :func:`unpack_weights` rebuilds the decode-minimal params pytree.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from nvfpcc_tpu.coder import huffman
from nvfpcc_tpu.models.decoder import TRANSMITTED_KERNELS

# as-is (fp32, uncoded) leaves of the decode pytree: path -> copied verbatim
_AS_IS_KEYS = tuple(f"{n}/b" for n in TRANSMITTED_KERNELS) + (
    "igdn/beta",
    "igdn/gamma",
)


def _round_kernel(layer: dict, qp: int) -> dict:
    layer = dict(layer)
    k = np.asarray(layer["kernel"], np.float64)
    layer["kernel"] = jnp.asarray((np.rint(k * qp) / qp).astype(np.float32))
    return layer


def quantize_residuals(params: dict, qp: int = 16) -> dict:
    """Return params with every transmitted kernel residual rounded to the
    1/qp grid (host math, float64 round → float32 values): the 7 decoder
    kernels, plus the 2 ctx-model masked kernels when present."""
    from nvfpcc_tpu.models.decoder import CTX_KERNELS

    dp = dict(params["decoder"])
    for name in TRANSMITTED_KERNELS:
        dp[name] = _round_kernel(dp[name], qp)
    out = dict(params)
    out["decoder"] = dp
    if "entropy" in params and all(n in params["entropy"] for n in CTX_KERNELS):
        ep = dict(params["entropy"])
        for name in CTX_KERNELS:
            ep[name] = _round_kernel(ep[name], qp)
        out["entropy"] = ep
    return out


def pack_weights(params: dict, qp: int = 16, entropy: str = "auto") -> dict:
    """Entropy-pack the decode-relevant weights of a (quantized) params tree.

    Returns the ``net_weight_pack`` dict (reference shape:
    ``util_code_quantized_weights.py:186-209``). ``entropy``:

    - "auto" (default, format v4): code under BOTH histogram modes below
      and keep whichever packs smaller (coding 51k ints twice is
      milliseconds of host work) — the pack's ``mode`` field records the
      winner, so decode needs no policy.
    - "range_pl": ONE range-coded stream under per-kernel empirical
      histograms — the seven kernels' residual distributions differ enough
      (H 1.6-3.2 b/res at vox10) that per-layer tables beat the global
      histogram by 2.7-3.0% at vox10 and 1.4% at vox11 INCLUDING the six
      extra tables (measured on trained checkpoints,
      results/round3/weight_layered.json). On tiny models the table
      overhead flips the sign, hence "auto".
    - "range": the former global-histogram default (~3% tighter than
      Huffman — measured 2.465 vs 2.393 b/residual entropy on a trained
      flagship checkpoint).
    - "huffman": the reference-style canonical-Huffman stream.
    - "gaussian": codes under the TRAINED scalar-Gaussian weight-rate model
      (the prior the RD objective optimizes, reference
      ``GaussianLikelihoodModel``, ``utils/network.py:287-305``) — table
      side-info is two f32 instead of a histogram, at the cost of
      model-vs-empirical mismatch in the stream.
    """
    if entropy == "auto":
        a = pack_weights(params, qp, entropy="range_pl")
        b = pack_weights(params, qp, entropy="range")
        return a if weight_pack_bits(a)[0] <= weight_pack_bits(b)[0] else b
    dp = params["decoder"]
    ints = []
    for name in TRANSMITTED_KERNELS:
        k = np.asarray(dp[name]["kernel"], np.float64) * qp
        ik = np.rint(k).astype(np.int64)
        if not np.allclose(k, ik, atol=1e-4):
            raise ValueError(
                f"kernel residual '{name}' is not on the 1/{qp} grid — "
                "run quantize_residuals first"
            )
        ints.append(ik)

    pack = {
        "qp": int(qp),
        "kernel_keys": list(TRANSMITTED_KERNELS),
        "shape_list": [tuple(t.shape) for t in ints],
        "element_length": int(sum(t.size for t in ints)),
    }
    flat = np.concatenate([t.reshape(-1) for t in ints])
    if entropy == "range_pl":
        pack.update({"mode": "range_pl", **pack_int_stream_layered(ints)})
    elif entropy == "range":
        pack.update({"mode": "range", **pack_int_stream(flat)})
    elif entropy == "gaussian":
        from nvfpcc_tpu.coder import range_coder as RC

        wr = dp.get("wrate")
        if wr is None:
            raise ValueError("entropy='gaussian' needs the trained wrate params")
        sigma = np.float32(abs(np.asarray(wr["sigma"]).reshape(-1)[0]))
        mu = np.float32(np.asarray(wr["mu"]).reshape(-1)[0])
        lo, hi = int(flat.min()), int(flat.max())
        cum = _gaussian_weight_tables(sigma, mu, lo, hi, qp)
        symbols = (flat - lo).astype(np.int32)
        table_ids = np.zeros(len(symbols), np.int32)
        stream = RC.encode(symbols, table_ids, cum)
        assert np.array_equal(
            RC.decode(stream, table_ids, cum), symbols
        ), "gaussian weight-coding self-check"
        pack.update(
            {
                "mode": "gaussian",
                "bit_stream": stream,
                "min_sym": lo,
                "max_sym": hi,
                "wrate_sigma": sigma,
                "wrate_mu": mu,
            }
        )
    elif entropy == "huffman":
        hpack = huffman.encode_tensors(ints)
        pack.update(
            {
                "mode": "huffman",
                "bit_stream": hpack["bit_stream"],
                "codebook": hpack["codebook"],
            }
        )
    else:
        raise ValueError(f"unknown weight entropy codec: {entropy}")

    as_is_pool = {}
    for key in _AS_IS_KEYS:
        node = dp
        for part in key.split("/"):
            node = node[part]
        as_is_pool[key] = np.asarray(node, np.float32)
    pack["as_is_pool"] = as_is_pool
    return pack


def pack_int_stream(flat: np.ndarray) -> dict:
    """Range-code a flat int array under its empirical histogram; returns
    ``{"bit_stream", "min_sym", "counts"}`` (round-trip asserted). Used for
    the decoder-kernel residual stream and the ctx-model residual stream."""
    from nvfpcc_tpu.coder import range_coder as RC

    flat = np.asarray(flat, np.int64).reshape(-1)
    lo, hi = int(flat.min()), int(flat.max())
    counts = np.bincount((flat - lo).astype(np.int64), minlength=hi - lo + 1)
    cum = RC.build_cum_from_counts(counts)
    symbols = (flat - lo).astype(np.int32)
    table_ids = np.zeros(len(symbols), np.int32)
    stream = RC.encode(symbols, table_ids, cum)
    assert np.array_equal(
        RC.decode(stream, table_ids, cum), symbols
    ), "int-stream range-coding self-check"
    return {"bit_stream": stream, "min_sym": lo, "counts": counts.astype(np.int64)}


def unpack_int_stream(pack: dict, n: int) -> np.ndarray:
    """Inverse of :func:`pack_int_stream`: n int64 symbols."""
    from nvfpcc_tpu.coder import range_coder as RC

    cum = RC.build_cum_from_counts(pack["counts"])
    table_ids = np.zeros(n, np.int32)
    flat = RC.decode(pack["bit_stream"], table_ids, cum).astype(np.int64)
    return flat + int(pack["min_sym"])


def int_stream_bits(pack: dict) -> int:
    """Stream + histogram-table bits of a :func:`pack_int_stream` payload."""
    return 8 * len(pack["bit_stream"]) + 16 + len(np.asarray(pack["counts"])) * 24


def pack_int_stream_layered(tensors) -> dict:
    """Range-code a list of int tensors as ONE stream under PER-TENSOR
    empirical histograms (one table per tensor, rows zero-padded to the
    widest alphabet — padding symbols carry only the 1/2^20 frequency
    floor, <0.1% rate). Returns ``{"bit_stream", "min_syms", "counts_list"}``
    (round-trip asserted)."""
    from nvfpcc_tpu.coder import range_coder as RC

    flats = [np.asarray(t, np.int64).reshape(-1) for t in tensors]
    mins = np.array([int(f.min()) for f in flats], np.int64)
    counts_list = [
        np.bincount((f - mn).astype(np.int64)).astype(np.int64)
        for f, mn in zip(flats, mins)
    ]
    width = max(len(c) for c in counts_list)
    cmat = np.zeros((len(flats), width), np.int64)
    for i, c in enumerate(counts_list):
        cmat[i, : len(c)] = c
    cum = RC.build_cum_from_counts(cmat)
    symbols = np.concatenate(
        [(f - mn).astype(np.int32) for f, mn in zip(flats, mins)]
    )
    table_ids = np.concatenate(
        [np.full(len(f), i, np.int32) for i, f in enumerate(flats)]
    )
    stream = RC.encode(symbols, table_ids, cum)
    assert np.array_equal(
        RC.decode(stream, table_ids, cum), symbols
    ), "layered int-stream range-coding self-check"
    return {"bit_stream": stream, "min_syms": mins, "counts_list": counts_list}


def unpack_int_stream_layered(pack: dict, sizes) -> np.ndarray:
    """Inverse of :func:`pack_int_stream_layered` for tensors of the given
    flat ``sizes``: one flat int64 array (concatenated in tensor order)."""
    from nvfpcc_tpu.coder import range_coder as RC

    counts_list = [np.asarray(c, np.int64) for c in pack["counts_list"]]
    mins = np.asarray(pack["min_syms"], np.int64)
    width = max(len(c) for c in counts_list)
    cmat = np.zeros((len(counts_list), width), np.int64)
    for i, c in enumerate(counts_list):
        cmat[i, : len(c)] = c
    cum = RC.build_cum_from_counts(cmat)
    table_ids = np.concatenate(
        [np.full(int(n), i, np.int32) for i, n in enumerate(sizes)]
    )
    flat = RC.decode(pack["bit_stream"], table_ids, cum).astype(np.int64)
    offsets = np.repeat(mins, np.asarray(sizes, np.int64))
    return flat + offsets


def _gaussian_weight_tables(
    sigma: np.float32, mu: np.float32, lo: int, hi: int, qp: int
) -> np.ndarray:
    """One integer table over residual ints [lo, hi] from the trained scalar
    Gaussian at step 1/qp: symbol i <-> residual value (lo+i)/qp, so in
    symbol space sigma' = sigma*qp, mu' = mu*qp - lo."""
    from nvfpcc_tpu.coder import range_coder as RC

    n = hi - lo + 1
    return RC.build_cum_tables(
        np.asarray([np.float64(sigma) * qp], np.float32),
        np.asarray([np.float64(mu) * qp - lo], np.float32),
        n_sym=n,
    )


def _decode_weight_ints(pack: dict):
    """Flat residual ints -> per-kernel tensors (mode-dispatched; packs
    without a mode field are format-v2 Huffman)."""
    n = int(pack["element_length"])
    mode = pack.get("mode", "huffman")
    if mode not in ("range_pl", "range", "huffman", "gaussian"):
        raise ValueError(
            f"unsupported weight entropy mode {mode!r} — "
            "pack written by a newer format version?"
        )
    if mode == "range_pl":
        sizes = [int(np.prod(s)) for s in pack["shape_list"]]
        flat = unpack_int_stream_layered(pack, sizes)
    elif mode == "range":
        flat = unpack_int_stream(pack, n)
    elif mode == "gaussian":
        from nvfpcc_tpu.coder import range_coder as RC

        lo, hi = int(pack["min_sym"]), int(pack["max_sym"])
        cum = _gaussian_weight_tables(
            pack["wrate_sigma"], pack["wrate_mu"], lo, hi, int(pack["qp"])
        )
        table_ids = np.zeros(n, np.int32)
        flat = RC.decode(pack["bit_stream"], table_ids, cum).astype(np.int64) + lo
    else:
        cb = huffman.HuffmanCodebook.from_dict(pack["codebook"])
        flat = huffman.decode(pack["bit_stream"], cb, n)
    out = []
    off = 0
    for shape in pack["shape_list"]:
        size = int(np.prod(shape))
        out.append(flat[off : off + size].reshape(shape))
        off += size
    return out


def unpack_weights(pack: dict) -> dict:
    """Rebuild the decode-minimal ``decoder`` params subtree from a pack."""
    qp = int(pack["qp"])
    tensors = _decode_weight_ints(pack)
    dp: dict = {}
    for name, ik in zip(pack["kernel_keys"], tensors):
        dp[name] = {
            "kernel": jnp.asarray((ik.astype(np.float64) / qp).astype(np.float32))
        }
    for key, value in pack["as_is_pool"].items():
        parts = key.split("/")
        node = dp
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(np.asarray(value, np.float32))
    return {"decoder": dp}


def weight_pack_bits(pack: dict) -> Tuple[int, int]:
    """(coded_bits, as_is_bits): entropy stream + model-table overhead vs
    fp32 pool — the reference's b_net split
    (``util_code_quantized_weights.py:150-168``)."""
    mode = pack.get("mode", "huffman")
    if mode == "range_pl":
        # per-kernel histogram tables: min_sym (16b) + 24-bit counts each
        table_bits = sum(
            16 + len(np.asarray(c)) * 24 for c in pack["counts_list"]
        )
    elif mode == "range":
        # histogram table: min_sym (16b) + one 24-bit count per symbol
        table_bits = 16 + len(np.asarray(pack["counts"])) * 24
    elif mode == "gaussian":
        table_bits = 2 * 32 + 2 * 16  # (sigma, mu) f32 + (min, max) int16
    else:
        cb = pack["codebook"]
        table_bits = len(np.asarray(cb["symbols"])) * (16 + 8)
    coded = 8 * len(pack["bit_stream"]) + table_bits
    as_is = 32 * sum(int(np.asarray(v).size) for v in pack["as_is_pool"].values())
    return coded, as_is


def check_quantized(params: dict, qp: int = 16) -> bool:
    """True iff all transmitted kernel residuals are on the 1/qp grid
    (the reference's discreteness precondition,
    ``util_code_quantized_weights.py:46-50``)."""
    dp = params["decoder"]
    for name in TRANSMITTED_KERNELS:
        k = np.asarray(dp[name]["kernel"], np.float64) * qp
        if not np.allclose(k, np.rint(k), atol=1e-4):
            return False
    return True
