"""Generate ``tests/fixtures/ref_style_vox10_v2.ply`` (fixture v2).

Fixture v1 (``ref_style_vox10.ply``) is a smooth, closed, uniformly sampled
bump-sphere patch — friendly geometry. v2 exercises the grids/train defaults
on what real scans actually look like (reference workflow:
``/root/reference/README.md:13-61`` — 8i clouds are open scanned surfaces
with wildly uneven density): an open draped sheet with a sharp crease, whose
sampling density falls ~20x along one parameter (the sparse end is
undersampled below voxel saturation, so blocks there hold scattered points),
plus a one-voxel-wide trailing filament that lands points into otherwise
empty blocks. Same exact 8i release format as v1: ascii PLY, float x/y/z +
uchar red/green/blue, 8i-style header comments.

Deterministic: ``python tests/fixtures/make_fixture_v2.py`` rewrites the
checked-in file byte-identically.
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_style_vox10_v2.ply")


def v2_points(seed: int = 7, samples: int = 14_000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # density p(u) ~ exp(-3u): ~20x more samples at u=0 than u=1
    raw = rng.random(samples)
    u = -np.log(1.0 - raw * (1.0 - np.exp(-3.0))) / 3.0
    v = rng.random(samples)

    # draped sheet spanning ~120x110 voxels, folded by a sharp crease at
    # u=0.45 and a slow wave along v
    x = 300.0 + 120.0 * u
    y = 360.0 + 110.0 * v
    crease = 34.0 * np.exp(-((u - 0.45) ** 2) / 0.004)
    z = 420.0 + 30.0 * np.sin(2.5 * np.pi * v) * (0.3 + u) + crease
    sheet = np.stack([x, y, z], axis=-1)

    # one-voxel-wide filament trailing off the sparse edge (u=1): a curve
    # descending ~110 voxels, ~2-3 points per voxel of arc length
    t = np.linspace(0.0, 1.0, 400)
    fil = np.stack(
        [
            425.0 + 20.0 * np.sin(5.0 * t),
            470.0 + 40.0 * t,
            430.0 - 110.0 * t,
        ],
        axis=-1,
    )

    pts = np.concatenate([sheet, fil], axis=0)
    pts = np.clip(np.rint(pts), 0, 1023).astype(np.int64)
    # unique, in scan order (np.unique sorts, which is fine for a fixture)
    return np.unique(pts, axis=0)


def colors_for(pts: np.ndarray) -> np.ndarray:
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    g = (pts - lo) / np.maximum(hi - lo, 1)
    rgb = np.stack([40 + 180 * g[:, 0], 60 + 160 * g[:, 2], 200 - 150 * g[:, 1]], -1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.int64)


def write(path: str = OUT) -> int:
    pts = v2_points()
    rgb = colors_for(pts)
    lines = [
        "ply",
        "format ascii 1.0",
        "comment Version 2, Copyright 2026, synthetic 8i-style fixture v2",
        "comment frame_to_world_scale 0.181731",
        "comment frame_to_world_translation 243.98 -2.521 242.81",
        "comment width 1023",
        f"element vertex {len(pts)}",
        "property float x",
        "property float y",
        "property float z",
        "property uchar red",
        "property uchar green",
        "property uchar blue",
        "end_header",
    ]
    body = [
        f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}"
        for p, c in zip(pts.tolist(), rgb.tolist())
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines + body) + "\n")
    return len(pts)


if __name__ == "__main__":
    n = write()
    pts = v2_points()
    blocks, counts = np.unique(pts >> 5, axis=0, return_counts=True)
    print(f"{n} voxels, {len(blocks)} level-5 blocks, "
          f"block occupancy {counts.min()}..{counts.max()} -> {OUT}")
