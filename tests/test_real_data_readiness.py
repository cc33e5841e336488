"""Real-data readiness: drive the checked-in 8i-style PLY fixture through the
full CLI pipeline (grids -> train -> encode -> decode -> eval).

The reference's published workflow is longdress_vox10_1300.ply
(/root/reference/README.md:13-61): float x/y/z + uchar red/green/blue
vertices in a 1024^3 grid. No 8i data ships in this image, so
``tests/fixtures/ref_style_vox10.ply`` is a synthetic cloud in the exact
release format (header comments included); this test is the evidence that a
real 8i cloud dropped into the runbook command (docs/REAL_DATA.md) parses,
partitions, trains, packs and round-trips.
"""

import os
import shutil

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ref_style_vox10.ply")
# v2 (tests/fixtures/make_fixture_v2.py): open creased sheet with a ~20x
# sampling-density gradient plus a one-voxel filament — non-sphere,
# variable-density geometry through the same defaults.
FIXTURE_V2 = os.path.join(
    os.path.dirname(__file__), "fixtures", "ref_style_vox10_v2.ply"
)


def test_fixture_parses_with_colors():
    from nvfpcc_tpu.io.ply import read_ply_points

    pts = read_ply_points(FIXTURE)
    assert pts.shape == (4898, 3)
    # integer voxel coordinates stored as float, inside the vox10 cube
    assert np.array_equal(pts, np.rint(pts))
    assert pts.min() >= 0 and pts.max() < 1024


def test_fixture_v2_is_unfriendly_geometry():
    """v2 must actually stress what v1 doesn't: open surface, uneven density."""
    from nvfpcc_tpu.io.ply import read_ply_points

    pts = np.rint(read_ply_points(FIXTURE_V2)).astype(np.int64)
    assert pts.min() >= 0 and pts.max() < 1024
    _, counts = np.unique(pts >> 5, axis=0, return_counts=True)
    assert len(counts) >= 30, "v2 should span many more blocks than v1's 8"
    assert counts.min() <= 5, "filament/sparse end must yield near-empty blocks"
    assert counts.max() / counts.min() >= 50, "density gradient must be large"


# v2's open, undersampled surface is much harder for the 8-epoch toy train:
# predicted occupancy stays low everywhere, so its non-degeneracy gate uses a
# lenient decode threshold (thh is a free encode knob, not trained state).
@pytest.mark.parametrize(
    "fixture,thh", [(FIXTURE, "0.4"), (FIXTURE_V2, "0.05")], ids=["v1", "v2"]
)
def test_fixture_full_pipeline(tmp_path, fixture, thh):
    from nvfpcc_tpu.cli import main as cli_main
    from nvfpcc_tpu.io.ply import read_ply_points

    cloud = str(tmp_path / "ref_style_vox10.ply")
    shutil.copy(fixture, cloud)
    ckpt = str(tmp_path / "ckpts")
    pack = str(tmp_path / "pack.pk")
    rc_enc = str(tmp_path / "rc_enc.ply")
    rc_dec = str(tmp_path / "rc_dec.ply")
    common = ["--depth", "10", "--level", "5", "--platform", "cpu"]
    small = ["--ch", "2", "--chanstr", "4,8,4,4"]

    assert cli_main(["grids", cloud, "--depth", "10", "--level", "5"]) == 0
    assert (
        cli_main(
            ["train", cloud, *common, *small, "--epochs", "8", "--phase_change",
             "3", "--batchsize", "4", "--checkpoint_dir", ckpt, "--eval_every", "4"]
        )
        == 0
    )
    assert (
        cli_main(
            ["encode", cloud, *common, *small, "--load_checkpoint", ckpt,
             "--pack_fn", pack, "--recon", rc_enc, "--thh", thh]
        )
        == 0
    )
    assert cli_main(["decode", pack, "--recon", rc_dec, "--platform", "cpu"]) == 0

    a, b = read_ply_points(rc_enc), read_ply_points(rc_dec)
    assert a.shape == b.shape and np.array_equal(a, b), "rc_enc != rc_dec"
    assert len(a) > 0, "empty reconstruction (toy train should clear the lenient thh)"
    assert cli_main(["eval", cloud, rc_dec, "--platform", "cpu"]) == 0
