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


def pack_weights(params: dict, qp: int = 16) -> dict:
    """Entropy-pack the decode-relevant weights of a (quantized) params tree.

    Returns the ``net_weight_pack`` dict (reference shape:
    ``util_code_quantized_weights.py:186-209``).
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
    hpack = huffman.encode_tensors(ints)

    as_is_pool = {}
    for key in _AS_IS_KEYS:
        node = dp
        for part in key.split("/"):
            node = node[part]
        as_is_pool[key] = np.asarray(node, np.float32)

    return {
        "qp": int(qp),
        "kernel_keys": list(TRANSMITTED_KERNELS),
        "bit_stream": hpack["bit_stream"],
        "codebook": hpack["codebook"],
        "element_length": hpack["element_length"],
        "shape_list": hpack["shape_list"],
        "as_is_pool": as_is_pool,
    }


def unpack_weights(pack: dict) -> dict:
    """Rebuild the decode-minimal ``decoder`` params subtree from a pack."""
    qp = int(pack["qp"])
    tensors = huffman.decode_tensors(
        {
            "bit_stream": pack["bit_stream"],
            "codebook": pack["codebook"],
            "element_length": pack["element_length"],
            "shape_list": pack["shape_list"],
        }
    )
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
    """(coded_bits, as_is_bits): Huffman stream + codebook vs fp32 pool —
    the reference's b_net split (``util_code_quantized_weights.py:150-168``)."""
    cb = pack["codebook"]
    codebook_bits = len(np.asarray(cb["symbols"])) * (16 + 8)
    coded = 8 * len(pack["bit_stream"]) + codebook_bits
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
