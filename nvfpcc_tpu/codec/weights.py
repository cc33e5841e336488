"""Decoder-weight quantization and entropy packing.

Capability rebuild of the reference weight-compression pipeline
(``manipulate_weights.py`` + ``util_code_quantized_weights.py``):

- :func:`quantize_residuals` rounds the 7 transmitted kernel residuals to the
  1/qp grid on host (reference ``manipulate_weights.py:36-49``; qp=16 gives
  the README's "4-bit" residuals). Quantization happens on host float64 so
  the integers that enter the Huffman coder and the dequantized kernels the
  decoder rebuilds are bit-identical by construction.
- :func:`pack_weights` Huffman-codes the integer residuals (canonical
  codebook, ``nvfpcc_tpu.coder.huffman``) and carries the small non-quantized
  remainder (biases, IGDN beta/gamma) as an fp32 as-is pool — the reference's
  ``as_is_pool`` (``util_code_quantized_weights.py:150-156``). Unlike the
  reference we ship only what reconstruction needs: the training-only aux
  heads, the latent generator and the weight-rate model stay home
  (the reference ships aux params and loads ``strict=False``,
  ``NVFPCC.py:577-583``).
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


def quantize_residuals(params: dict, qp: int = 16) -> dict:
    """Return params with the 7 transmitted kernel residuals rounded to the
    1/qp grid (host math, float64 round → float32 values)."""
    dp = dict(params["decoder"])
    for name in TRANSMITTED_KERNELS:
        layer = dict(dp[name])
        k = np.asarray(layer["kernel"], np.float64)
        layer["kernel"] = jnp.asarray(
            (np.rint(k * qp) / qp).astype(np.float32)
        )
        dp[name] = layer
    out = dict(params)
    out["decoder"] = dp
    return out


def pack_weights(params: dict, qp: int = 16, entropy: str = "range") -> dict:
    """Entropy-pack the decode-relevant weights of a (quantized) params tree.

    Returns the ``net_weight_pack`` dict (reference shape:
    ``util_code_quantized_weights.py:186-209``). ``entropy``: "range" codes
    the residual integers with the native range coder under their empirical
    histogram (~3% tighter than Huffman — measured 2.465 vs 2.393 b/residual
    entropy on a trained flagship checkpoint); "huffman" keeps the
    reference-style canonical-Huffman stream.
    """
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
    if entropy == "range":
        from nvfpcc_tpu.coder import range_coder as RC

        lo, hi = int(flat.min()), int(flat.max())
        counts = np.bincount((flat - lo).astype(np.int64), minlength=hi - lo + 1)
        cum = RC.build_cum_from_counts(counts)
        symbols = (flat - lo).astype(np.int32)
        table_ids = np.zeros(len(symbols), np.int32)
        stream = RC.encode(symbols, table_ids, cum)
        assert np.array_equal(
            RC.decode(stream, table_ids, cum), symbols
        ), "weight range-coding self-check"
        pack.update(
            {
                "mode": "range",
                "bit_stream": stream,
                "min_sym": lo,
                "counts": counts.astype(np.int64),
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


def _decode_weight_ints(pack: dict):
    """Flat residual ints -> per-kernel tensors (mode-dispatched; packs
    without a mode field are format-v2 Huffman)."""
    n = int(pack["element_length"])
    mode = pack.get("mode", "huffman")
    if mode == "range":
        from nvfpcc_tpu.coder import range_coder as RC

        cum = RC.build_cum_from_counts(pack["counts"])
        table_ids = np.zeros(n, np.int32)
        flat = RC.decode(pack["bit_stream"], table_ids, cum).astype(np.int64)
        flat += int(pack["min_sym"])
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
    if pack.get("mode", "huffman") == "range":
        # histogram table: min_sym (16b) + one 24-bit count per symbol
        table_bits = 16 + len(np.asarray(pack["counts"])) * 24
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
