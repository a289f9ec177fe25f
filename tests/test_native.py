"""Native (C++) host-kernel tests: build, then parity vs the numpy paths."""

import numpy as np
import pytest

from stereoscene_tpu import native
from stereoscene_tpu.data import preprocess
from stereoscene_tpu.data.labels import remap_lut

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_unpack_remap_matches_numpy():
    rng = np.random.RandomState(0)
    n = 8 * 1024
    labels = rng.choice([0, 10, 40, 252, 99], size=n).astype(np.uint16)
    invalid_bits = (rng.rand(n) < 0.2).astype(np.uint8)
    packed = np.packbits(invalid_bits)

    ours = native.unpack_remap_labels(labels, packed, remap_lut())

    lut = remap_lut()
    ref = lut[labels].astype(np.float32)
    ref[np.isclose(preprocess.unpack_bits(packed)[:n], 1)] = 255
    np.testing.assert_array_equal(ours, ref.astype(np.uint8))


def test_majority_downsample_matches_numpy():
    rng = np.random.RandomState(1)
    grid = rng.choice(
        [0, 1, 9, 255], size=(16, 16, 8), p=[0.6, 0.15, 0.15, 0.1]
    ).astype(np.uint8)
    ours = native.majority_downsample(grid, 2)
    ref = preprocess.majority_downsample(grid, 2)
    np.testing.assert_array_equal(ours, ref)


def test_scatter_depth_nearest_wins():
    uvd = np.array(
        [[4.0, 3.0, 10.0], [4.2, 3.1, 5.0], [4.0, 3.0, 20.0],
         [100.0, 2.0, 5.0], [2.0, 2.0, -1.0]],
        np.float32,
    )
    seg = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    depth, seg_out = native.scatter_depth(uvd, 8, 10, seg)
    assert depth[3, 4] == 5.0      # nearest of the three at (3,4)
    assert seg_out[3, 4] == 2.0
    assert depth.sum() == 5.0       # OOB and negative-depth points dropped


def test_point_majority_vote():
    coords = np.array(
        [[0, 0, 0], [0, 0, 0], [0, 0, 0], [1, 1, 1]], np.int32
    )
    labels = np.array([3, 3, 5, 7], np.int32)
    out = native.point_majority_vote(coords, labels, (2, 2, 2), 20)
    assert out[0, 0, 0] == 3
    assert out[1, 1, 1] == 7
    assert out[0, 1, 0] == 0
