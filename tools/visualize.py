#!/usr/bin/env python
"""Headless voxel visualization: saved prediction .npy -> PNG / GIF video.

Equivalent of the reference ``tools/visualization.py`` (mayavi renderer,
ref tools/visualization.py:42-213) with a TPU-env-friendly matplotlib
backend, covering the reference's full feature set:

- voxel cubes colored by the SemanticKITTI palette (ref :138-160 LUT)
- camera frustum wireframe mesh from ``T_velo_2_cam`` + focal length
  (ref :55-78: 5 vertices, 4 side triangles, d-meter depth)
- camera-FOV mask: voxels outside the image frustum are drawn dimmed to
  2/3 intensity (ref :111-136,167-169); the mask is *computed* from the
  calibration here rather than loaded from the reference's precomputed
  fov_mask_1.npy
- batch rendering + GIF video export (PIL; the reference uses imageio)
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import List, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Official SemanticKITTI class colors (ref tools/visualization.py:138-160).
PALETTE = np.array([
    [0, 0, 0],        # 0 empty
    [100, 150, 245],  # car
    [100, 230, 245],  # bicycle
    [30, 60, 150],    # motorcycle
    [80, 30, 180],    # truck
    [100, 80, 250],   # other-vehicle
    [255, 30, 30],    # person
    [255, 40, 200],   # bicyclist
    [150, 30, 90],    # motorcyclist
    [255, 0, 255],    # road
    [255, 150, 255],  # parking
    [75, 0, 75],      # sidewalk
    [175, 0, 75],     # other-ground
    [255, 200, 0],    # building
    [255, 120, 50],   # fence
    [0, 175, 0],      # vegetation
    [135, 60, 0],     # trunk
    [150, 240, 80],   # terrain
    [255, 240, 150],  # pole
    [255, 0, 0],      # traffic-sign
], dtype=np.float32) / 255.0


def voxel_centers(dims: Tuple[int, int, int], voxel_size: float,
                  vox_origin=np.zeros(3)) -> np.ndarray:
    """[X*Y*Z, 3] velodyne-frame voxel centers (ref :18-39 get_grid_coords,
    without its x/y swap — we keep the grid's own XYZ order and put the
    origin shift here)."""
    xx, yy, zz = np.meshgrid(
        np.arange(dims[0]), np.arange(dims[1]), np.arange(dims[2]),
        indexing="ij",
    )
    coords = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float64)
    return (coords + 0.5) * voxel_size + np.asarray(vox_origin)


def camera_frustum_mesh(
    T_velo_2_cam: np.ndarray,
    img_size: Tuple[int, int],
    f: float,
    d: float = 7.0,
) -> Tuple[np.ndarray, List[Tuple[int, int, int]]]:
    """Wireframe camera mesh (ref :55-78): apex at the camera center and
    the four image-plane corners at depth ``d`` meters.

    Vertices are returned in the *absolute velodyne frame* — the same frame
    ``render_voxels`` plots voxel centers in ((occ + 0.5) * voxel_size +
    vox_origin) — so the overlay aligns with the voxels. (The reference
    subtracts its voxel origin because mayavi plots grid-index coordinates;
    here both live in metric velo space.)
    """
    x = d * img_size[0] / (2.0 * f)
    y = d * img_size[1] / (2.0 * f)
    tri_points = np.array([
        [0.0, 0.0, 0.0],
        [x, y, d],
        [-x, y, d],
        [-x, -y, d],
        [x, -y, d],
    ])
    tri_points = np.hstack([tri_points, np.ones((5, 1))])
    verts = (np.linalg.inv(T_velo_2_cam) @ tri_points.T).T[:, :3]
    triangles = [(0, 1, 2), (0, 1, 4), (0, 3, 4), (0, 2, 3)]
    return verts, triangles


def compute_fov_mask(
    dims: Tuple[int, int, int],
    voxel_size: float,
    vox_origin,
    T_velo_2_cam: np.ndarray,
    img_size: Tuple[int, int],
    f: float,
    cx: Optional[float] = None,
    cy: Optional[float] = None,
) -> np.ndarray:
    """[X*Y*Z] bool: voxel center projects inside the image
    (replaces the reference's precomputed fov_mask_1.npy)."""
    centers = voxel_centers(dims, voxel_size, vox_origin)
    homo = np.hstack([centers, np.ones((len(centers), 1))])
    cam = (T_velo_2_cam @ homo.T).T[:, :3]
    z = cam[:, 2]
    cx = img_size[0] / 2.0 if cx is None else cx
    cy = img_size[1] / 2.0 if cy is None else cy
    u = f * cam[:, 0] / np.maximum(z, 1e-6) + cx
    v = f * cam[:, 1] / np.maximum(z, 1e-6) + cy
    return (z > 0) & (u >= 0) & (u < img_size[0]) & (v >= 0) \
        & (v < img_size[1])


def render_voxels(
    grid: np.ndarray,
    out_path: str,
    voxel_size: float = 1.0,
    vox_origin=np.zeros(3),
    fov_mask: Optional[np.ndarray] = None,
    frustum: Optional[Tuple[np.ndarray, List]] = None,
    max_points: int = 200000,
    elev: float = 35.0,
    azim: float = -60.0,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    occ = np.argwhere((grid > 0) & (grid != 255))
    if len(occ) > max_points:
        sel = np.random.RandomState(0).choice(len(occ), max_points, False)
        occ = occ[sel]
    colors = PALETTE[grid[occ[:, 0], occ[:, 1], occ[:, 2]] % 20]
    if fov_mask is not None:
        flat = np.ravel_multi_index(occ.T, grid.shape)
        outside = ~fov_mask[flat]
        # outside-FOV dimming to 2/3 (ref :167-169)
        colors = np.where(outside[:, None], colors * (2.0 / 3.0), colors)

    xyz = (occ + 0.5) * voxel_size + np.asarray(vox_origin)

    fig = plt.figure(figsize=(12, 8), dpi=120)
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=colors, s=1.2, marker="s",
               linewidths=0)
    if frustum is not None:
        verts, triangles = frustum
        for (a, b, c) in triangles:
            for i, j in ((a, b), (b, c), (c, a)):
                ax.plot(
                    [verts[i, 0], verts[j, 0]],
                    [verts[i, 1], verts[j, 1]],
                    [verts[i, 2], verts[j, 2]],
                    color="black", linewidth=1.2,
                )
    ax.set_box_aspect((
        grid.shape[0] * voxel_size, grid.shape[1] * voxel_size,
        grid.shape[2] * voxel_size * 2,
    ))
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    fig.tight_layout(pad=0)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def export_video(frame_paths: List[str], out_path: str, fps: int = 10):
    """PNG frame sequence -> GIF (the reference's imageio video export)."""
    from PIL import Image

    frames = [Image.open(p).convert("P") for p in frame_paths]
    if not frames:
        raise ValueError("no frames to export")
    frames[0].save(
        out_path, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )


def add_render_args(p: argparse.ArgumentParser):
    """Shared rendering flags (also used by misc/visualize_results.py)."""
    p.add_argument("--out", default="vis")
    p.add_argument("--max-frames", type=int, default=50)
    p.add_argument("--voxel-size", type=float, default=0.2)
    p.add_argument("--vox-origin", nargs=3, type=float,
                   default=[0.0, -25.6, -2.0])
    p.add_argument("--t-velo2cam", default=None,
                   help=".npy 4x4 velodyne->camera transform; enables the "
                        "frustum mesh + FOV dimming")
    p.add_argument("--img-size", nargs=2, type=int, default=[1220, 370])
    p.add_argument("--focal", type=float, default=707.0912)
    p.add_argument("--video", default=None,
                   help="write a GIF video of all rendered frames")


def render_frames(items, args) -> List[str]:
    """Render (name, grid) items with the args from add_render_args;
    returns the written PNG paths (and writes the GIF when --video)."""
    os.makedirs(args.out, exist_ok=True)
    frustum = fov = None
    written = []
    for name, grid in items:
        if args.t_velo2cam and frustum is None:
            t = np.load(args.t_velo2cam)
            frustum = camera_frustum_mesh(
                t, tuple(args.img_size), args.focal
            )
            fov = compute_fov_mask(
                grid.shape, args.voxel_size, args.vox_origin, t,
                tuple(args.img_size), args.focal,
            )
        out_path = os.path.join(args.out, name + ".png")
        render_voxels(
            grid, out_path, voxel_size=args.voxel_size,
            vox_origin=args.vox_origin, fov_mask=fov, frustum=frustum,
        )
        written.append(out_path)
        print("wrote", out_path)
    if args.video and written:
        export_video(written, args.video)
        print("wrote", args.video)
    return written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pred", help=".npy voxel grid or directory of them")
    add_render_args(p)
    args = p.parse_args()

    paths = (
        sorted(glob.glob(os.path.join(args.pred, "*.npy")))
        if os.path.isdir(args.pred)
        else [args.pred]
    )[: args.max_frames]
    render_frames(
        ((os.path.splitext(os.path.basename(pth))[0], np.load(pth))
         for pth in paths),
        args,
    )


if __name__ == "__main__":
    main()
