"""Temporal (4D) occupancy: ego-motion BEV feature alignment + fusion.

Rebuild of the BEVDet4D/BEVDepthOccupancy4D machinery
(ref: occupancy/detectors/bevdepth.py:181-293 ``shift_feature``,
bevdepth_occupancy.py:362-419 ``BEVDepthOccupancy4D``): the previous frame's
voxel features are warped into the current ego frame using the relative
camera poses, then channel-concatenated with the current features before the
BEV encoder. Gradients flow through the key frame only (the reference wraps
adjacent frames in no_grad; here ``stop_gradient``).

The reference's alignment is a 2D BEV-plane affine resample (grid_sample
align_corners=True); voxel features share the same XY warp across Z.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry


def relative_bev_transform(
    rots_curr: jnp.ndarray,
    trans_curr: jnp.ndarray,
    rots_adj: jnp.ndarray,
    trans_adj: jnp.ndarray,
) -> jnp.ndarray:
    """Current-lidar -> adjacent-lidar 2D homogeneous transform [B, 3, 3].

    The camera is the same physical sensor in both frames, so
    l0->l1 = c2l0 @ inv(c2l1) (ref bevdepth.py:208-224), reduced to the
    (x, y, 1) BEV plane by dropping the z row/column (ref :226-227).
    """
    b = rots_curr.shape[0]

    def to44(r, t):
        m = jnp.zeros((b, 4, 4), jnp.float32)
        m = m.at[:, :3, :3].set(r.astype(jnp.float32))
        m = m.at[:, :3, 3].set(t.astype(jnp.float32))
        return m.at[:, 3, 3].set(1.0)

    c02l0 = to44(rots_curr, trans_curr)
    c12l0 = to44(rots_adj, trans_adj)
    l02l1 = jnp.einsum(
        "bij,bjk->bik", c02l0, jnp.linalg.inv(c12l0),
        precision=jax.lax.Precision.HIGHEST,
    )
    keep = jnp.asarray([0, 1, 3])
    return l02l1[:, keep][:, :, keep]


def shift_voxel_feature(
    feat: jnp.ndarray,
    bev_tf: jnp.ndarray,
    dx: np.ndarray,
    bx: np.ndarray,
) -> jnp.ndarray:
    """Resample [B, X, Y, Z, C] voxel features along the BEV plane so the
    adjacent frame's content aligns with the current ego frame.

    grid-cell (ix, iy) -> metric (x, y) via feat2bev (ref :231-241), warped
    by ``bev_tf``, back to cells, bilinear with zero padding
    (align_corners=True semantics: cell indices used directly).
    """
    b, nx_, ny_, nz_, c = feat.shape
    ix = jnp.arange(nx_, dtype=jnp.float32)
    iy = jnp.arange(ny_, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(ix, iy, indexing="ij")  # [X, Y]

    # cells -> metric
    mx = gx * dx[0] + (bx[0] - dx[0] / 2.0)
    my = gy * dx[1] + (bx[1] - dx[1] / 2.0)
    pts = jnp.stack([mx, my, jnp.ones_like(mx)], axis=-1)  # [X, Y, 3]
    warped = jnp.einsum(
        "bij,xyj->bxyi", bev_tf.astype(jnp.float32), pts,
        precision=jax.lax.Precision.HIGHEST,
    )
    # metric -> source cells
    sx = (warped[..., 0] - (bx[0] - dx[0] / 2.0)) / dx[0]
    sy = (warped[..., 1] - (bx[1] - dx[1] / 2.0)) / dx[1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None, None]
    fy = (sy - y0)[..., None, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(xi, yi, w):
        inside = (xi >= 0) & (xi < nx_) & (yi >= 0) & (yi < ny_)
        xc = jnp.clip(xi, 0, nx_ - 1)
        yc = jnp.clip(yi, 0, ny_ - 1)
        flat = feat.reshape(b, nx_ * ny_, nz_, c)
        idx = (xc * ny_ + yc).reshape(b, -1)
        g = jnp.take_along_axis(flat, idx[:, :, None, None], axis=1)
        g = g.reshape(b, nx_, ny_, nz_, c)
        return g * (w * inside[..., None, None].astype(feat.dtype))

    out = gather(x0i, y0i, (1 - fx) * (1 - fy))
    out += gather(x0i + 1, y0i, fx * (1 - fy))
    out += gather(x0i, y0i + 1, (1 - fx) * fy)
    out += gather(x0i + 1, y0i + 1, fx * fy)
    return out


def fuse_temporal_voxel_features(
    curr_feat: jnp.ndarray,
    prev_feat: jnp.ndarray,
    batch_curr,
    batch_prev,
    dx: np.ndarray,
    bx: np.ndarray,
    detach_prev: bool = True,
) -> jnp.ndarray:
    """Align prev into curr's frame and concat on channels
    (ref bevdepth.py:289-293). Pose inputs use the lifted (left) camera."""
    if detach_prev:
        prev_feat = jax.lax.stop_gradient(prev_feat)
    tf = relative_bev_transform(
        batch_curr["rots"][:, 0], batch_curr["trans"][:, 0],
        batch_prev["rots"][:, 0], batch_prev["trans"][:, 0],
    )
    aligned = shift_voxel_feature(prev_feat, tf, dx, bx)
    return jnp.concatenate([curr_feat, aligned], axis=-1)
