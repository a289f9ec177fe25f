"""Lift-splat-shoot geometry for the stereo occupancy pipeline.

Pure functions (numpy for static precomputation, jnp for traced code) covering
the reference geometry math:

- ``gen_dx_bx``       grid spacing/origin/extent
  (ref: ViewTransformerLSSBEVDepth.py:27-31)
- ``create_frustum``  image-plane frustum of (u, v, depth) sample points
  (ref: ViewTransformerLSSBEVDepth.py:110-121)
- ``get_geometry``    frustum -> ego-frame XYZ, incl. the KITTI 3x4-intrinsics
  translation shift (ref: ViewTransformerLSSBEVDepth.py:123-156)
- ``get_mlp_input``   30-dim camera-parameter embedding for KITTI
  (ref: ViewTransformerLSSBEVDepth.py:604-659)
- ``voxel_indices``   quantization of ego XYZ into voxel ranks + validity mask
  (ref: ViewTransformerLSSVoxel.py:432-476 voxel_pooling index math)
- ``disparity_positions`` depth-bin -> disparity-axis sample positions for the
  stereo volume warp (ref: ViewTransformerLSSVoxel.py:128-156 ``warp``)

All functions are shape-polymorphic over batch and camera axes and contain no
Python-level data-dependent control flow, so they trace cleanly under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Geometry must be bit-accurate float32: TPU einsum defaults to bf16 inputs,
# which quantizes voxel coordinates. Pin the highest precision for all
# geometry contractions.
_PRECISION = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """LSS voxel grid bounds. Matches the reference ``grid_config`` dict keys
    (configs/occupancy/semantickitti/stereoscene.py:44-49)."""

    xbound: Tuple[float, float, float]  # (min, max, step)
    ybound: Tuple[float, float, float]
    zbound: Tuple[float, float, float]
    dbound: Tuple[float, float, float]  # depth bins (min, max, step)

    @property
    def num_depth_bins(self) -> int:
        lo, hi, step = self.dbound
        return int(round((hi - lo) / step))


def gen_dx_bx(
    xbound: Sequence[float], ybound: Sequence[float], zbound: Sequence[float]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Voxel sizes ``dx``, first-voxel centers ``bx``, grid extents ``nx``.

    ref: ViewTransformerLSSBEVDepth.py:27-31
    """
    bounds = [xbound, ybound, zbound]
    dx = np.array([row[2] for row in bounds], dtype=np.float32)
    bx = np.array([row[0] + row[2] / 2.0 for row in bounds], dtype=np.float32)
    nx = np.array(
        [int(round((row[1] - row[0]) / row[2])) for row in bounds], dtype=np.int32
    )
    return dx, bx, nx


def create_frustum(
    input_size: Tuple[int, int], downsample: int, dbound: Sequence[float]
) -> np.ndarray:
    """Frustum of (u, v, d) sample points, shape [D, fH, fW, 3].

    u/v are pixel coordinates in the *augmented* input image; d is metric
    depth. ref: ViewTransformerLSSBEVDepth.py:110-121
    """
    ogf_h, ogf_w = input_size
    f_h, f_w = ogf_h // downsample, ogf_w // downsample
    ds = np.arange(dbound[0], dbound[1], dbound[2], dtype=np.float32)
    num_d = ds.shape[0]
    ds = np.broadcast_to(ds[:, None, None], (num_d, f_h, f_w))
    xs = np.linspace(0, ogf_w - 1, f_w, dtype=np.float32)
    xs = np.broadcast_to(xs[None, None, :], (num_d, f_h, f_w))
    ys = np.linspace(0, ogf_h - 1, f_h, dtype=np.float32)
    ys = np.broadcast_to(ys[None, :, None], (num_d, f_h, f_w))
    return np.stack([xs, ys, ds], axis=-1)


def get_geometry(
    frustum: jnp.ndarray,
    rots: jnp.ndarray,
    trans: jnp.ndarray,
    intrins: jnp.ndarray,
    post_rots: jnp.ndarray,
    post_trans: jnp.ndarray,
    bda: jnp.ndarray,
) -> jnp.ndarray:
    """Map the frustum into ego-frame XYZ. Returns [B, N, D, fH, fW, 3].

    Pipeline per point (ref: ViewTransformerLSSBEVDepth.py:123-156):
      1. undo the image post-augmentation homography,
      2. (u*d, v*d, d),
      3. KITTI 3x4 intrinsics: subtract the projection translation column,
      4. multiply by rots @ inv(K3x3), add trans (camera -> ego/lidar),
      5. apply the BEV data augmentation matrix ``bda``.

    Args:
      frustum: [D, fH, fW, 3].
      rots: [B, N, 3, 3] camera-to-ego rotation.
      trans: [B, N, 3] camera-to-ego translation.
      intrins: [B, N, 3, 3] or [B, N, 3, 4] (KITTI P-matrix).
      post_rots: [B, N, 3, 3] augmentation rotation/scale homography.
      post_trans: [B, N, 3] augmentation translation.
      bda: [B, 3, 3] or [B, 4, 4] BEV augmentation matrix.
    """
    b, n = trans.shape[:2]
    compute_dtype = jnp.promote_types(frustum.dtype, jnp.float32)

    points = frustum.astype(compute_dtype)
    points = points[None, None] - post_trans.reshape(b, n, 1, 1, 1, 3)
    inv_post = jnp.linalg.inv(post_rots.astype(compute_dtype))
    points = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, points, precision=_PRECISION)

    # (u, v, d) -> (u*d, v*d, d)
    points = jnp.concatenate(
        [points[..., :2] * points[..., 2:3], points[..., 2:3]], axis=-1
    )

    if intrins.shape[-1] == 4:
        shift = intrins[..., :3, 3]  # KITTI projection translation column
        points = points - shift.reshape(b, n, 1, 1, 1, 3)
        intrins = intrins[..., :3, :3]

    combine = jnp.einsum(
        "bnij,bnjk->bnik",
        rots.astype(compute_dtype),
        jnp.linalg.inv(intrins.astype(compute_dtype)),
        precision=_PRECISION,
    )
    points = jnp.einsum("bnij,bndhwj->bndhwi", combine, points, precision=_PRECISION)
    points = points + trans.reshape(b, n, 1, 1, 1, 3)

    if bda.shape[-1] == 4:
        ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
        homo = jnp.concatenate([points, ones], axis=-1)
        homo = jnp.einsum(
            "bij,bndhwj->bndhwi",
            bda.astype(compute_dtype),
            homo,
            precision=_PRECISION,
        )
        points = homo[..., :3]
    else:
        points = jnp.einsum(
            "bij,bndhwj->bndhwi",
            bda.astype(compute_dtype),
            points,
            precision=_PRECISION,
        )
    return points


def get_mlp_input(
    rot: jnp.ndarray,
    tran: jnp.ndarray,
    intrin: jnp.ndarray,
    post_rot: jnp.ndarray,
    post_tran: jnp.ndarray,
    bda: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Camera-parameter vector fed to the camera-aware SE layers.

    For KITTI 3x4 intrinsics this is 30-dim: 7 intrinsic entries, 6 post-aug
    entries, 5 bda entries, then the flattened 3x4 [rot|tran] sensor-to-ego
    matrix. ref: ViewTransformerLSSBEVDepth.py:604-659

    Returns [B, N, C_cam].
    """
    b, n = rot.shape[:2]
    if bda is None:
        bda = jnp.broadcast_to(jnp.eye(3, dtype=rot.dtype)[None], (b, 3, 3))
    bda_n = jnp.broadcast_to(bda[:, None], (b, n) + bda.shape[-2:])

    if intrin.shape[-1] == 4:
        feats = [
            intrin[:, :, 0, 0],
            intrin[:, :, 1, 1],
            intrin[:, :, 0, 2],
            intrin[:, :, 1, 2],
            intrin[:, :, 0, 3],
            intrin[:, :, 1, 3],
            intrin[:, :, 2, 3],
            post_rot[:, :, 0, 0],
            post_rot[:, :, 0, 1],
            post_tran[:, :, 0],
            post_rot[:, :, 1, 0],
            post_rot[:, :, 1, 1],
            post_tran[:, :, 1],
            bda_n[:, :, 0, 0],
            bda_n[:, :, 0, 1],
            bda_n[:, :, 1, 0],
            bda_n[:, :, 1, 1],
            bda_n[:, :, 2, 2],
        ]
        mlp_input = jnp.stack(feats, axis=-1)
        if bda.shape[-1] == 4:
            mlp_input = jnp.concatenate([mlp_input, bda_n[:, :, :3, -1]], axis=-1)
    else:
        feats = [
            intrin[:, :, 0, 0],
            intrin[:, :, 1, 1],
            intrin[:, :, 0, 2],
            intrin[:, :, 1, 2],
            post_rot[:, :, 0, 0],
            post_rot[:, :, 0, 1],
            post_tran[:, :, 0],
            post_rot[:, :, 1, 0],
            post_rot[:, :, 1, 1],
            post_tran[:, :, 1],
            bda_n[:, :, 0, 0],
            bda_n[:, :, 0, 1],
            bda_n[:, :, 1, 0],
            bda_n[:, :, 1, 1],
            bda_n[:, :, 2, 2],
        ]
        mlp_input = jnp.stack(feats, axis=-1)

    sensor2ego = jnp.concatenate([rot, tran.reshape(b, n, 3, 1)], axis=-1)
    sensor2ego = sensor2ego.reshape(b, n, 12)
    return jnp.concatenate([mlp_input, sensor2ego], axis=-1)


def voxel_indices(
    geom: jnp.ndarray,
    dx: np.ndarray,
    bx: np.ndarray,
    nx: np.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize ego XYZ into integer voxel coordinates + in-bounds mask.

    ref: ViewTransformerLSSVoxel.py:440-449 (``((geom - (bx - dx/2)) / dx)``)

    Args:
      geom: [..., 3] ego-frame coordinates.
    Returns:
      coords: [..., 3] int32 voxel coordinates (unclipped).
      valid:  [...] bool mask of points inside the grid.
    """
    dx = jnp.asarray(dx, dtype=geom.dtype)
    bx = jnp.asarray(bx, dtype=geom.dtype)
    nxj = jnp.asarray(nx, dtype=jnp.int32)
    # truncation toward zero (not floor): torch's ``.long()`` cast keeps
    # points with fractional index in (-1, 0) aliased into bin 0, and the
    # golden full-model parity test shows this boundary shell carries real
    # mass — floor() here loses ~6% of kept points vs the reference
    coords = ((geom - (bx - dx / 2.0)) / dx).astype(jnp.int32)
    valid = jnp.all((coords >= 0) & (coords < nxj), axis=-1)
    return coords, valid


def flatten_voxel_ranks(
    coords: jnp.ndarray, valid: jnp.ndarray, nx: np.ndarray
) -> jnp.ndarray:
    """Linearize voxel coords to ranks in [0, X*Y*Z); invalid -> X*Y*Z.

    The sentinel rank (== num_voxels) lets segment-sum based pooling drop
    out-of-bounds points in one extra bucket.
    """
    num_x, num_y, num_z = int(nx[0]), int(nx[1]), int(nx[2])
    ranks = (
        coords[..., 0] * (num_y * num_z) + coords[..., 1] * num_z + coords[..., 2]
    )
    sentinel = num_x * num_y * num_z
    return jnp.where(valid, ranks, sentinel)


def disparity_positions(calib: jnp.ndarray, num_depth: int) -> jnp.ndarray:
    """Disparity-axis sample positions for the stereo volume depth warp.

    Depth bin k (1-indexed, k = 1..D) samples the group-correlation volume at
    fractional disparity index ``calib / (4 * k)`` where
    ``calib = fx * baseline`` at full image resolution. Positions beyond the
    disparity range are handled by the sampler's zero padding.

    ref: ViewTransformerLSSVoxel.py:128-156 (``warp`` with down=1,
    maxdepth=D; grid x = (calib / 4) / arange(1, 1 + D))

    Args:
      calib: [B] fx*baseline per sample.
    Returns:
      [B, D] float positions into the disparity axis.
    """
    k = jnp.arange(1, num_depth + 1, dtype=jnp.float32)
    return calib.astype(jnp.float32)[:, None] / 4.0 / k[None, :]
