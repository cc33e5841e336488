"""Decodable-forever fixtures for retired pack format versions (v1-v3).

``codec.decode`` promises every version in ``_DECODABLE_VERSIONS`` stays
decodable (codec/codec.py:48-49) — the format-stability contract the
reference never states for its own unversioned pickle (``NVFPCC.py:486-493``).
These tests pin the promise with golden bytes checked into
``tests/fixtures/packs/`` (generated once by ``scripts/make_pack_fixtures.py``;
see its docstring for exactly which dispatch path each version exercises).

Golden comparisons are host-deterministic (integer coding, exact f32 grid
arithmetic); the reconstruction check compares ``decode()`` against a live
``reconstruct_points`` on the golden arrays rather than baked float points,
so legitimate XLA numeric drift can never rot the fixtures.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from nvfpcc_tpu import codec
from nvfpcc_tpu.codec import weights as W
from nvfpcc_tpu.coder import range_coder as RC
from nvfpcc_tpu.models import decoder as M

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "packs")


def _load(version: int):
    pack = codec.load_pack(os.path.join(FIXDIR, f"pack_v{version}.pk"))
    golden = np.load(os.path.join(FIXDIR, f"golden_v{version}.npz"))
    return pack, golden


def _spec_from_pack(pack):
    mc = pack["model"]
    return M.build_model_spec(
        int(mc["ch"]),
        tuple(int(c) for c in mc["chanstr"].split(",")),
        mc["seed_tag"],
        mc.get("entropy_mode", "channel"),
        ctx_hidden=int(mc.get("ctx_hidden", M.CTX_HIDDEN)),
        ctx_tail=int(mc.get("ctx_tail", 0)),
    )


@pytest.mark.parametrize("version", [1, 2, 3])
def test_old_pack_decodes_end_to_end(version):
    pack, golden = _load(version)
    assert pack["format_version"] == version

    # origins: v1 raw int16 vs v2/v3 octree bits, both to the golden set
    origins = codec.decode_origins(
        pack["origins"], int(pack["codec"]["depth"]), int(pack["codec"]["level"])
    )
    assert np.array_equal(origins, golden["origins"])

    # weights: every transmitted kernel reconstructs exactly (1/qp grid +
    # seeded init — deterministic host math)
    params = W.unpack_weights(pack["net_weight_pack"])
    for name in W.TRANSMITTED_KERNELS:
        assert np.array_equal(
            np.asarray(params["decoder"][name]["kernel"]),
            golden[f"kernel_{name}"],
        ), f"v{version} kernel {name} mismatch"

    # full decode runs, and equals a live reconstruct on the golden arrays
    # (same jitted program → exact equality)
    points, info = codec.decode(pack)
    assert info["n_blocks"] == len(golden["origins"])
    spec = _spec_from_pack(pack)
    live = codec.reconstruct_points(
        spec,
        params,
        golden["latents"].astype(np.float32),
        golden["origins"],
        float(pack["codec"]["thh"]),
    )
    assert np.array_equal(points, live)


@pytest.mark.parametrize("version", [1, 2])
def test_old_gaussian_latent_stream_decodes(version):
    """v1/v2 latent packs have no "mode" key — the absent-key default path."""
    pack, golden = _load(version)
    lp = pack["latent_pack"]
    assert "mode" not in lp
    assert np.array_equal(RC.decode_latents(lp), golden["latents"])


def test_v3_ctx_stream_decodes_without_payload_qp():
    """Older v3 ctx payloads predate the "qp" key (absent = 16)."""
    from nvfpcc_tpu.coder import ctx_coder as CTX

    pack, golden = _load(3)
    lp = pack["latent_pack"]
    assert lp["mode"] == "ctx" and "qp" not in lp["ctx"]
    spec = _spec_from_pack(pack)
    ints = CTX.ctx_ints_from_payload(spec, lp["ctx"])
    out = CTX.decode_latents_ctx(
        lp["stream"], tuple(lp["shape"]), ints, channel_ar=False
    )
    assert np.array_equal(out, golden["latents"])


def test_v1_weight_pack_has_no_mode_key():
    """v1/v2 weight packs predate the "mode" key (absent = huffman)."""
    pack, _ = _load(1)
    assert "mode" not in pack["net_weight_pack"]
    assert "codebook" in pack["net_weight_pack"]


def test_unknown_version_rejected():
    pack, _ = _load(1)
    pack["format_version"] = 99
    with pytest.raises(ValueError, match="unsupported pack format"):
        codec.decode(pack)
