"""Spec <-> code agreement for the pack container (docs/FORMAT.md).

CLAUDE.md calls docs/FORMAT.md a format contract; the round-4 review found
it had silently drifted (title said v3 while the code wrote v4, and
``model.ctx_tail`` was written but undocumented). These tests make drift a
failure:

 - the doc's stated version (title + example) must equal
   ``codec.PACK_FORMAT_VERSION``;
 - a freshly-encoded pack per entropy mode must carry ONLY keys the schema
   below documents (the schema mirrors FORMAT.md §container/§Weights/
   §Origins/§Latents — extend BOTH when the format grows), and all required
   keys.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pytest

from nvfpcc_tpu import codec
from nvfpcc_tpu.config import CodecConfig, ModelConfig
from nvfpcc_tpu.models import decoder as M
from nvfpcc_tpu.octree import partition as OT

FORMAT_MD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "FORMAT.md"
)

# --- the documented schema (docs/FORMAT.md), as (required, optional) keys ---

TOP = ({"format_version", "model", "codec", "net_weight_pack", "origins",
        "latent_pack"}, set())
MODEL = ({"ch", "chanstr", "seed_tag", "entropy_mode"}, {"ctx_hidden", "ctx_tail"})
CODEC = ({"thh", "qp", "depth", "level", "n_points_src"}, {"recon_dtype"})
WEIGHTS_COMMON = {"qp", "kernel_keys", "mode", "bit_stream", "element_length",
                  "shape_list", "as_is_pool"}
WEIGHTS_BY_MODE = {
    "range_pl": {"min_syms", "counts_list"},
    "range": {"min_sym", "counts"},
    "gaussian": {"min_sym", "max_sym", "wrate_sigma", "wrate_mu"},
    "huffman": {"codebook"},
}
ORIGINS = ({"mode", "bits", "n_bits"}, set())
LATENTS_BY_MODE = {
    # mode value (None = absent key, the channel/spatio Gaussian layout)
    None: ({"shape", "stream", "sigma", "mu"}, set()),
    "spatio": ({"shape", "stream", "sigma", "mu", "mode"}, set()),
    "gmm": ({"shape", "stream", "mode", "params"}, set()),
    "factorized": ({"shape", "stream", "mode", "params"}, set()),
    "ctx": ({"shape", "stream", "mode", "ctx"}, set()),
    "ctx_ar": ({"shape", "stream", "mode", "ctx"}, set()),
}
CTX_PAYLOAD = ({"res", "bias", "qp"}, set())


def _check(d: dict, required: set, optional: set, where: str):
    keys = set(d.keys())
    undocumented = keys - required - optional
    assert not undocumented, f"{where}: undocumented keys {sorted(undocumented)}"
    missing = required - keys
    assert not missing, f"{where}: missing required keys {sorted(missing)}"


def test_doc_version_matches_code():
    text = open(FORMAT_MD).read()
    m = re.search(r"^# pack\.pk bitstream format \(version (\d+)\)", text)
    assert m, "FORMAT.md title must state the version"
    assert int(m.group(1)) == codec.PACK_FORMAT_VERSION, "FORMAT.md title drifted"
    m = re.search(r'"format_version": (\d+),', text)
    assert m, "FORMAT.md example must show format_version"
    assert int(m.group(1)) == codec.PACK_FORMAT_VERSION, "FORMAT.md example drifted"


def _encode(entropy_mode: str, **model_kw):
    mcfg = ModelConfig(ch=2, chanstr="4,8,4,4", entropy_mode=entropy_mode,
                       **model_kw)
    spec = M.build_model_spec(
        mcfg.ch, mcfg.channels, mcfg.seed_tag, entropy_mode,
        ctx_hidden=mcfg.ctx_hidden, ctx_tail=mcfg.ctx_tail,
    )
    params = M.init_params(spec)
    emb = np.asarray(M.init_embeddings(3, mcfg.ch))
    pts = np.array([[0, 0, 0], [40, 8, 2], [70, 70, 70]], np.int64)
    origins = OT.leaf_origins(pts, 7, 2)
    ccfg = CodecConfig(depth=7, level=2)
    return codec.encode(params, emb, origins, mcfg, ccfg, 100, spec=spec).pack


@pytest.mark.parametrize(
    "mode,model_kw",
    [
        ("channel", {}),
        ("spatio", {}),
        ("gmm", {}),
        ("factorized", {}),
        ("ctx", {}),
        ("ctx_ar", {}),
        ("ctx_ar", {"ctx_tail": 4}),
    ],
    ids=["channel", "spatio", "gmm", "factorized", "ctx", "ctx_ar", "ctx_ar_tail"],
)
def test_pack_keys_match_documented_schema(mode, model_kw):
    pack = _encode(mode, **model_kw)
    assert pack["format_version"] == codec.PACK_FORMAT_VERSION

    _check(pack, *TOP, "pack")
    _check(pack["model"], *MODEL, "model")
    _check(pack["codec"], *CODEC, "codec")
    _check(pack["origins"], *ORIGINS, "origins")

    wp = pack["net_weight_pack"]
    wmode = wp.get("mode", "huffman")
    assert wmode in WEIGHTS_BY_MODE, f"undocumented weight mode {wmode}"
    _check(wp, WEIGHTS_COMMON | WEIGHTS_BY_MODE[wmode], set(),
           f"net_weight_pack[{wmode}]")

    lp = pack["latent_pack"]
    lmode = lp.get("mode")
    assert lmode in LATENTS_BY_MODE, f"undocumented latent mode {lmode}"
    _check(lp, *LATENTS_BY_MODE[lmode], f"latent_pack[{lmode}]")
    if lmode in ("ctx", "ctx_ar"):
        _check(lp["ctx"], *CTX_PAYLOAD, "latent_pack.ctx")
        _check(lp["ctx"]["res"],
               {"bit_stream", "min_sym", "counts", "element_length"}, set(),
               "latent_pack.ctx.res")

    # metadata gating: ctx_hidden only in ctx modes, ctx_tail only when set
    if mode in ("ctx", "ctx_ar"):
        assert "ctx_hidden" in pack["model"]
    else:
        assert "ctx_hidden" not in pack["model"]
    assert ("ctx_tail" in pack["model"]) == bool(model_kw.get("ctx_tail"))


def test_bf16_recon_dtype_documented_layout():
    mcfg = ModelConfig(ch=2, chanstr="4,8,4,4")
    spec = M.build_model_spec(mcfg.ch, mcfg.channels, mcfg.seed_tag)
    params = M.init_params(spec)
    emb = np.asarray(M.init_embeddings(3, mcfg.ch))
    pts = np.array([[0, 0, 0], [40, 8, 2], [70, 70, 70]], np.int64)
    origins = OT.leaf_origins(pts, 7, 2)
    pack = codec.encode(
        params, emb, origins, mcfg,
        CodecConfig(depth=7, level=2, recon_dtype="bf16"), 100, spec=spec,
    ).pack
    _check(pack["codec"], *CODEC, "codec")
    assert pack["codec"]["recon_dtype"] == "bf16"
