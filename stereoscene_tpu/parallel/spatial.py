"""Spatial sharding of the voxel grid — the context-parallel analog.

The reference never shards its volumes (SURVEY.md section 5: it fits
everything on one GPU via activation checkpointing). For the high-res
512x512x64 variant the voxel tensors no longer fit one chip, so we shard the
grid's X axis over a ``space`` mesh axis and let GSPMD partition the 3D
convolutions (it inserts the halo exchanges for the 3x3x3 stencils
automatically — the hand-written NCCL halo code a CUDA framework would need
simply doesn't exist here).

Usage: build a 2D mesh ('data', 'space'); inside the jitted step, constrain
the voxel features after the splat with ``shard_voxels`` and keep parameters
replicated. Collectives ride ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def voxel_pspec(spatial_axis: str = "space") -> P:
    """[B, X, Y, Z, C] sharded batch over 'data' and X over the space axis."""
    return P("data", spatial_axis, None, None, None)


def shard_voxels(x, mesh, spatial_axis: str = "space"):
    """Constrain a [B, X, Y, Z, C] tensor to the (data, space) layout."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, voxel_pspec(spatial_axis))
    )
