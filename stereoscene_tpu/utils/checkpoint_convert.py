"""Torch -> JAX parameter conversion primitives.

The reference ships torch checkpoints (mmcv registry-built module trees);
running them here requires mapping every tensor into the flax param pytree
(SURVEY.md section 7, weight-conversion fidelity). This module provides the
*tensor-level* transforms (layout changes between torch and our channels-last
modules) and a generic state-dict walker; per-model name tables live with the
model code.

Layout rules:
  Conv2d   [Cout, Cin/g, kh, kw]      -> kernel [kh, kw, Cin/g, Cout]
  Conv3d   [Cout, Cin/g, kd, kh, kw]  -> kernel [kd, kh, kw, Cin/g, Cout]
  ConvTranspose(2|3)d [Cin, Cout, k*] -> kernel [k*, Cin, Cout]
     (our ConvTransposeTorch stores the *unflipped* torch kernel laid out
      spatial-first; it flips at call time)
  Linear   [out, in]                  -> kernel [in, out]
  1x1 conv used as Dense              -> squeeze spatial dims + transpose
  Norm weight/bias                    -> scale/bias (fp32)
  BN running_mean/var                 -> batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def conv_transpose2d_kernel(w: np.ndarray) -> np.ndarray:
    # torch [Cin, Cout, kh, kw] -> [kh, kw, Cin, Cout]
    return np.transpose(w, (2, 3, 0, 1))


def conv_transpose3d_kernel(w: np.ndarray) -> np.ndarray:
    # torch [Cin, Cout, kd, kh, kw] -> [kd, kh, kw, Cin, Cout]
    return np.transpose(w, (2, 3, 4, 0, 1))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def conv1x1_as_dense(w: np.ndarray) -> np.ndarray:
    """1x1(x1) conv weight -> Dense kernel."""
    w = np.asarray(w)
    while w.ndim > 2:
        w = w.squeeze(-1)
    return np.transpose(w, (1, 0))


def dcn_weight(w: np.ndarray) -> np.ndarray:
    """mmcv DeformConv weight [Cout, Cin/g, 3, 3] -> our tap-major
    [9, Cin/g, Cout] layout (ops/deform_conv.py)."""
    cout, cing, kh, kw = w.shape
    return np.transpose(w.reshape(cout, cing, kh * kw), (2, 1, 0))


def set_in(tree: Dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def assert_tree_shapes(converted: Dict, template: Dict, prefix: str = ""):
    """Check that every converted leaf matches the template's shape."""
    for k, v in converted.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            assert k in template, f"unexpected subtree {p}"
            assert_tree_shapes(v, template[k], p)
        else:
            t = template[k]
            assert tuple(v.shape) == tuple(t.shape), (
                f"shape mismatch at {p}: {v.shape} vs {t.shape}"
            )
