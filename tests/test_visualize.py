"""Tests for the visualization pipeline: frustum mesh geometry, FOV mask,
rendering, and GIF export."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.visualize import (
    camera_frustum_mesh,
    compute_fov_mask,
    export_video,
    render_voxels,
    voxel_centers,
)

# velodyne -> camera: x_c = -y_v, y_c = -z_v, z_c = x_v (standard KITTI-ish)
T = np.array([
    [0, -1, 0, 0],
    [0, 0, -1, 0],
    [1, 0, 0, 0],
    [0, 0, 0, 1.0],
])


def test_frustum_mesh_geometry():
    verts, tris = camera_frustum_mesh(T, (1220, 370), f=707.0, d=7.0)
    assert verts.shape == (5, 3) and len(tris) == 4
    # apex at the camera center (origin in velo frame here)
    np.testing.assert_allclose(verts[0], 0, atol=1e-12)
    # all corner points at depth d along camera z == velo x
    np.testing.assert_allclose(verts[1:, 0], 7.0, atol=1e-9)
    # corners symmetric about the optical axis: (x, y, d) vs (-x, y, d)
    # in camera frame map to mirrored velo-y
    np.testing.assert_allclose(verts[1, 1], -verts[2, 1], atol=1e-9)
    np.testing.assert_allclose(verts[1, 2], verts[2, 2], atol=1e-9)


def test_fov_mask_front_only():
    dims = (8, 8, 4)
    mask = compute_fov_mask(dims, 1.0, [0, -4.0, -2.0], T, (1220, 370),
                            f=300.0)
    centers = voxel_centers(dims, 1.0, [0, -4.0, -2.0])
    # everything behind the camera (x_v <= 0) must be outside the FOV
    behind = centers[:, 0] <= 0
    assert not np.any(mask & behind)
    # something in front should be visible
    assert mask.sum() > 0
    # a voxel straight ahead is visible
    idx = np.argmin(np.abs(centers - [4.5, 0.5, 0.5]).sum(1))
    assert mask[idx]


def test_render_and_video(tmp_path):
    rng = np.random.RandomState(0)
    frames = []
    for i in range(2):
        grid = rng.randint(0, 20, (16, 16, 4)).astype(np.int32)
        mask = compute_fov_mask(grid.shape, 1.0, [0, -8.0, -2.0], T,
                                (1220, 370), f=500.0)
        frustum = camera_frustum_mesh(T, (1220, 370), f=500.0)
        # frustum verts and voxel centers share the absolute velo frame:
        # the apex sits at the camera center (velo origin for this T),
        # inside the metric extent of the grid
        assert np.allclose(frustum[0][0], 0.0)
        out = str(tmp_path / f"frame{i}.png")
        render_voxels(grid, out, voxel_size=1.0, vox_origin=[0, -8.0, -2.0],
                      fov_mask=mask, frustum=frustum)
        assert os.path.getsize(out) > 1000
        frames.append(out)
    gif = str(tmp_path / "clip.gif")
    export_video(frames, gif, fps=5)
    with open(gif, "rb") as f:
        assert f.read(6) in (b"GIF87a", b"GIF89a")
