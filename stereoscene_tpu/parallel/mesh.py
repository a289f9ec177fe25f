"""Device mesh + sharding helpers.

The reference's only parallelism is DDP over NCCL
(ref: occupancy/apis/mmdet_train.py:75-79, SURVEY.md section 2.4). The
TPU-native equivalent is a named mesh with a ``data`` axis: the batch is
sharded over it, parameters are replicated, and the gradient all-reduce is
inserted by XLA when the jitted train step's outputs demand replicated
params. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` (engine/train.py).

A second optional axis ``space`` is reserved for spatial sharding of the
voxel grid (the high-res 512x512x64 variant — the framework's analog of
context/sequence parallelism, SURVEY.md section 5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    devices=None,
    space: Optional[int] = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axes) == 1:
        shape = (n,)
    elif len(axes) == 2:
        if space is None:
            # favor the data axis; space axis gets the largest power-of-two
            # divisor up to 4
            space = 1
            for cand in (4, 2, 1):
                if n % cand == 0 and n // cand >= 1:
                    space = cand
                    break
        assert n % space == 0, (n, space)
        shape = (n // space, space)
    else:
        raise ValueError(f"unsupported axes {axes}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
