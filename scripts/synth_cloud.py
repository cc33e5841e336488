"""Generate deterministic synthetic voxelized surface clouds at vox10 scale.

No 8i dataset ships with this repo (the reference assumes you download
longdress_vox10_1300.ply yourself, ``README.md:13``), so benchmarks and
full-pipeline experiments use a synthetic stand-in with the same statistics:
a closed 2-D surface voxelized in a 1024^3 grid with ~850k occupied voxels
spread over ~1k level-5 leaf blocks (longdress: 857k points, 917 blocks).

The shape is a radially-modulated sphere ("bumpy sphere"): enough curvature
variation that blocks see diverse local geometry, fully deterministic from
the seed.

Usage: python scripts/synth_cloud.py out.ply [--depth 10] [--radius 0.25]
       [--bumps 6] [--amp 0.08] [--samples 8000000] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bumpy_sphere_cloud(
    depth: int = 10,
    radius: float = 0.25,
    bumps: int = 6,
    amp: float = 0.08,
    samples: int = 8_000_000,
    seed: int = 0,
) -> np.ndarray:
    """(N, 3) unique int64 voxel coords of the voxelized surface."""
    size = 1 << depth
    center = size / 2.0
    base_r = size * radius
    rng = np.random.default_rng(seed)
    # uniform directions
    v = rng.standard_normal((samples, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    theta = np.arccos(np.clip(v[:, 2], -1, 1))
    phi = np.arctan2(v[:, 1], v[:, 0])
    r = base_r * (1.0 + amp * np.sin(bumps * theta) * np.sin(bumps * phi))
    pts = center + v * r[:, None]
    pts = np.clip(np.rint(pts), 0, size - 1).astype(np.int64)
    return np.unique(pts, axis=0)


def torus_cloud(
    depth: int = 10,
    radius: float = 0.30,
    tube: float = 0.10,
    samples: int = 8_000_000,
    seed: int = 0,
) -> np.ndarray:
    """Torus surface: major radius ``radius``·size, tube ``tube``·size."""
    size = 1 << depth
    c = size / 2.0
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 2 * np.pi, samples)
    v = rng.uniform(0, 2 * np.pi, samples)
    R, r = size * radius, size * tube
    pts = np.stack(
        [
            c + (R + r * np.cos(v)) * np.cos(u),
            c + (R + r * np.cos(v)) * np.sin(u),
            c + r * np.sin(v),
        ],
        -1,
    )
    pts = np.clip(np.rint(pts), 0, size - 1).astype(np.int64)
    return np.unique(pts, axis=0)


def helix_cloud(
    depth: int = 10,
    radius: float = 0.28,
    tube: float = 0.055,
    turns: float = 3.0,
    samples: int = 8_000_000,
    seed: int = 0,
) -> np.ndarray:
    """Helical tube surface sweeping the cube vertically."""
    size = 1 << depth
    c = size / 2.0
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 1, samples)
    v = rng.uniform(0, 2 * np.pi, samples)
    R, r = size * radius, size * tube
    ang = 2 * np.pi * turns * t
    # helix center line
    cx = c + R * np.cos(ang)
    cy = c + R * np.sin(ang)
    cz = size * 0.1 + size * 0.8 * t
    # tube frame (approximate normal/binormal)
    nx, ny = np.cos(ang), np.sin(ang)
    pts = np.stack(
        [
            cx + r * np.cos(v) * nx,
            cy + r * np.cos(v) * ny,
            cz + r * np.sin(v),
        ],
        -1,
    )
    pts = np.clip(np.rint(pts), 0, size - 1).astype(np.int64)
    return np.unique(pts, axis=0)


SHAPES = {"sphere": bumpy_sphere_cloud, "torus": torus_cloud, "helix": helix_cloud}


def main() -> None:
    from nvfpcc_tpu.io.ply import write_ply_points

    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--shape", choices=sorted(SHAPES), default="sphere")
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--radius", type=float, default=0.25)
    ap.add_argument("--bumps", type=int, default=6)
    ap.add_argument("--amp", type=float, default=0.08)
    ap.add_argument("--samples", type=int, default=8_000_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.shape == "sphere":
        pts = bumpy_sphere_cloud(
            args.depth, args.radius, args.bumps, args.amp, args.samples, args.seed
        )
    elif args.shape == "torus":
        pts = torus_cloud(args.depth, args.radius, samples=args.samples, seed=args.seed)
    else:
        pts = helix_cloud(args.depth, args.radius, samples=args.samples, seed=args.seed)
    write_ply_points(args.out, pts, ascii=False)
    blocks = len(np.unique(pts >> (args.depth - 5), axis=0))
    print(f"{len(pts)} voxels, {blocks} level-5 blocks -> {args.out}")


if __name__ == "__main__":
    main()
