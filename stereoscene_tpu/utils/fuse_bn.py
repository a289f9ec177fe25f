"""Fold BatchNorm into preceding convolutions for inference.

Equivalent of the reference's ``tools/misc/fuse_conv_bn.py``: for every
(conv kernel, bn) pair in a params tree, rescale the conv kernel and fold the
normalization into a bias, leaving the BN as an identity affine. Works on the
param pytree directly, so the module structure (and checkpoint layout) is
unchanged — only the numbers move.

y = gamma * (W*x - mean) / sqrt(var + eps) + beta
  = (gamma/sqrt(var+eps)) * W * x + (beta - gamma*mean/sqrt(var+eps))
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Tuple

import numpy as np


def _find_conv_bn_pairs(params: Dict, stats: Dict):
    """Yield (node, conv_key, bn_key, bn_stats) for conv+bn siblings
    following the ConvBNAct naming (conv/Conv_0 + bn)."""
    if not isinstance(params, dict):
        return
    conv_key = None
    if "conv" in params and isinstance(params["conv"], dict):
        conv_key = "conv"
    elif "Conv_0" in params and isinstance(params["Conv_0"], dict):
        conv_key = "Conv_0"
    bn_key = "bn" if "bn" in params else (
        "BatchNorm_0" if "BatchNorm_0" in params else None
    )
    if conv_key and bn_key and isinstance(stats, dict) and bn_key in stats:
        # unwrap the ConvNd wrapper's inner Conv_0 if present
        node = params
        if "Conv_0" in params[conv_key]:
            conv_node = params[conv_key]
            yield {"conv": conv_node["Conv_0"], "bn": params[bn_key]}, \
                "conv", "bn", stats[bn_key]
        else:
            yield node, conv_key, bn_key, stats[bn_key]
        return
    for key, val in params.items():
        if isinstance(val, dict):
            sub_stats = stats.get(key, {}) if isinstance(stats, dict) else {}
            yield from _find_conv_bn_pairs(val, sub_stats)


def fuse_conv_bn(
    params: Dict[str, Any], batch_stats: Dict[str, Any], eps: float = 1e-3
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Return (fused_params, fused_batch_stats)."""
    params = copy.deepcopy(
        {k: v for k, v in params.items()}
    )
    batch_stats = copy.deepcopy({k: v for k, v in batch_stats.items()})

    count = 0
    for node, conv_key, bn_key, bn_stat in _find_conv_bn_pairs(
        params, batch_stats
    ):
        conv = node[conv_key]
        bn = node[bn_key]
        inner = bn.get("BatchNorm_0", bn)
        stat_inner = bn_stat.get("BatchNorm_0", bn_stat)
        if "scale" not in inner or "mean" not in stat_inner:
            continue
        gamma = np.asarray(inner["scale"], np.float32)
        beta = np.asarray(inner["bias"], np.float32)
        mean = np.asarray(stat_inner["mean"], np.float32)
        var = np.asarray(stat_inner["var"], np.float32)
        factor = gamma / np.sqrt(var + eps)

        # scale the conv kernel; turn the BN into the residual affine
        # (convs here are bias-free, so the fused bias lives in the BN's
        # beta with neutralized statistics)
        kernel = np.asarray(conv["kernel"], np.float32)
        conv["kernel"] = (kernel * factor).astype(kernel.dtype)
        inner["scale"] = np.ones_like(gamma)
        inner["bias"] = (beta - factor * mean).astype(np.float32)
        stat_inner["mean"] = np.zeros_like(mean)
        stat_inner["var"] = np.ones_like(var) - eps
        count += 1
    return params, batch_stats, count
