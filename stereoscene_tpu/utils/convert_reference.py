"""Full torch->flax parameter name map for the active StereoScene model.

Walks our flax param tree (models/detector.py BEVDepthOccupancy) and derives,
for every leaf, the corresponding key in the reference's torch ``state_dict``
(mmcv registry-built module tree; layer structures read from
ViewTransformerLSSVoxel.py / ViewTransformerLSSBEVDepth.py /
efficientnet.py / second_fpn_3d.py / resnet3d.py / occhead.py / attention.py)
together with the tensor-layout transform from utils/checkpoint_convert.py.

``convert_reference_checkpoint`` consumes a raw ``{name: ndarray}`` dict (a
torch checkpoint's state_dict exported to numpy) and returns (params,
batch_stats) trees for our model. Completeness is enforced: every leaf of the
target tree must be produced, and a round-trip test
(tests/test_convert_reference.py) synthesizes a fake state_dict through the
inverse transforms to prove full coverage and invertible layouts.
"""

from __future__ import annotations

import difflib
import re
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from . import checkpoint_convert as cc

# state_dict entries that are expected but carry no information for us:
# BN step counters, and mmcv checkpoint bookkeeping occasionally exported
# alongside the weights.
_NOISE_KEY = re.compile(r"(^|\.)num_batches_tracked$|^(meta|optimizer)($|\.)")


def _inv(transform: Callable) -> Callable:
    """Inverse layout transforms (all are permutations/reshapes)."""
    if transform is cc.conv2d_kernel:
        return lambda w: np.transpose(w, (3, 2, 0, 1))
    if transform is cc.conv3d_kernel:
        return lambda w: np.transpose(w, (4, 3, 0, 1, 2))
    if transform is cc.conv_transpose2d_kernel:
        return lambda w: np.transpose(w, (2, 3, 0, 1))
    if transform is cc.conv_transpose3d_kernel:
        return lambda w: np.transpose(w, (3, 4, 0, 1, 2))
    if transform is cc.linear_kernel:
        return lambda w: np.transpose(w, (1, 0))
    if transform is _identity:
        return _identity
    if transform is cc.dcn_weight:
        return lambda w: np.transpose(w, (2, 1, 0)).reshape(
            w.shape[2], w.shape[1], 3, 3
        )
    raise KeyError(transform)


def _identity(x):
    return np.asarray(x)


def _dense_from_conv(w):
    return cc.conv1x1_as_dense(w)


def _inv_dense_to_conv2d(w):
    # dense [in, out] -> torch conv [out, in, 1, 1]
    return np.transpose(w, (1, 0))[:, :, None, None]


def _inv_dense_to_conv3d(w):
    return np.transpose(w, (1, 0))[:, :, None, None, None]


Rule = Tuple[str, Callable, Callable]  # (torch key, fwd transform, inverse)


def _conv_rule(tkey: str, ndim: int) -> Dict[str, Rule]:
    t = cc.conv2d_kernel if ndim == 2 else cc.conv3d_kernel
    return {"kernel": (f"{tkey}.weight", t, _inv(t))}


def _norm_rules(tkey: str) -> Dict[str, Rule]:
    return {
        "scale": (f"{tkey}.weight", _identity, _identity),
        "bias": (f"{tkey}.bias", _identity, _identity),
    }


def _bn_stats_rules(tkey: str) -> Dict[str, Rule]:
    return {
        "mean": (f"{tkey}.running_mean", _identity, _identity),
        "var": (f"{tkey}.running_var", _identity, _identity),
    }


def _dense_rules(tkey: str, from_conv: int = 0) -> Dict[str, Rule]:
    """from_conv: 0 = torch Linear, 2/3 = torch 1x1 convNd."""
    if from_conv == 0:
        kernel = (f"{tkey}.weight", cc.linear_kernel, _inv(cc.linear_kernel))
    elif from_conv == 2:
        kernel = (f"{tkey}.weight", _dense_from_conv, _inv_dense_to_conv2d)
    else:
        kernel = (f"{tkey}.weight", _dense_from_conv, _inv_dense_to_conv3d)
    return {
        "kernel": kernel,
        "bias": (f"{tkey}.bias", _identity, _identity),
    }


class NameMap:
    """Collects per-leaf rules for the params and batch_stats trees."""

    def __init__(self):
        self.params: Dict[str, Rule] = {}
        self.stats: Dict[str, Rule] = {}

    def add(self, our_prefix: str, rules: Dict[str, Rule], stats=False):
        table = self.stats if stats else self.params
        for leaf, rule in rules.items():
            table[f"{our_prefix}/{leaf}"] = rule

    # --- composite module helpers (our naming -> torch naming) ---

    def conv_nd(self, ours: str, theirs: str, ndim: int, bias: bool = True):
        """Our ConvNd wrapper (inner Conv_0)."""
        self.add(f"{ours}/Conv_0", _conv_rule(theirs, ndim))
        if bias:
            self.add(
                f"{ours}/Conv_0",
                {"bias": (f"{theirs}.bias", _identity, _identity)},
            )

    def raw_conv(self, ours: str, theirs: str, ndim: int, bias: bool = False):
        """A bare nn.Conv leaf (kernel directly under `ours`)."""
        self.add(ours, _conv_rule(theirs, ndim))
        if bias:
            self.add(
                ours, {"bias": (f"{theirs}.bias", _identity, _identity)}
            )

    def groupnorm(self, ours: str, theirs: str):
        self.add(f"{ours}/GroupNorm_0", _norm_rules(theirs))

    def batchnorm(self, ours: str, theirs: str):
        self.add(f"{ours}/BatchNorm_0", _norm_rules(theirs))
        self.add(f"{ours}/BatchNorm_0", _bn_stats_rules(theirs), stats=True)

    def deconv(self, ours: str, theirs: str, ndim: int, bias: bool = False):
        t = (cc.conv_transpose2d_kernel if ndim == 2
             else cc.conv_transpose3d_kernel)
        self.add(ours, {"kernel": (f"{theirs}.weight", t, _inv(t))})
        if bias:
            self.add(
                ours, {"bias": (f"{theirs}.bias", _identity, _identity)}
            )

    def dense(self, ours: str, theirs: str, from_conv: int = 0):
        self.add(ours, _dense_rules(theirs, from_conv))

    def mlp(self, ours: str, theirs: str):
        self.dense(f"{ours}/fc1", f"{theirs}.fc1")
        self.dense(f"{ours}/fc2", f"{theirs}.fc2")

    def se_layer(self, ours: str, theirs: str):
        """BEVDepth SELayer: conv_reduce/conv_expand 1x1 convs -> Dense."""
        self.dense(f"{ours}/conv_reduce", f"{theirs}.conv_reduce",
                   from_conv=2)
        self.dense(f"{ours}/conv_expand", f"{theirs}.conv_expand",
                   from_conv=2)

    def convgn3d(self, ours: str, theirs: str):
        """Our ConvGN3d vs the reference convbn_3d Sequential(conv3d, GN)."""
        self.conv_nd(f"{ours}/conv", f"{theirs}.0", 3, bias=False)
        self.groupnorm(f"{ours}/gn", f"{theirs}.1")

    def hourglass(self, ours: str, theirs: str):
        """ref hourglass (ViewTransformerLSSVoxel.py:70-96): convN =
        Sequential(convbn_3d, ReLU); conv5/6 = Sequential(deconv, BN3d)."""
        for i in (1, 2, 3, 4):
            self.convgn3d(f"{ours}/conv{i}", f"{theirs}.conv{i}.0")
        for i in (5, 6):
            self.deconv(f"{ours}/conv{i}_deconv", f"{theirs}.conv{i}.0", 3)
            self.batchnorm(f"{ours}/conv{i}_bn", f"{theirs}.conv{i}.1")
        self.convgn3d(f"{ours}/redir1", f"{theirs}.redir1")
        self.convgn3d(f"{ours}/redir2", f"{theirs}.redir2")

    def basicblock2d(self, ours: str, theirs: str):
        """mmdet ResNet BasicBlock."""
        self.conv_nd(f"{ours}/conv1", f"{theirs}.conv1", 2, bias=False)
        self.batchnorm(f"{ours}/bn1", f"{theirs}.bn1")
        self.conv_nd(f"{ours}/conv2", f"{theirs}.conv2", 2, bias=False)
        self.batchnorm(f"{ours}/bn2", f"{theirs}.bn2")

    def aspp(self, ours: str, theirs: str):
        for i in (1, 2, 3, 4):
            self.raw_conv(f"{ours}/aspp{i}_conv", f"{theirs}.aspp{i}.atrous_conv", 2)
            self.batchnorm(f"{ours}/aspp{i}_bn", f"{theirs}.aspp{i}.bn")
        self.conv_nd(f"{ours}/gap_conv", f"{theirs}.global_avg_pool.1", 2,
                     bias=False)
        self.groupnorm(f"{ours}/gap_gn", f"{theirs}.global_avg_pool.2")
        self.conv_nd(f"{ours}/out_conv", f"{theirs}.conv1", 2, bias=False)
        self.batchnorm(f"{ours}/out_bn", f"{theirs}.bn1")

    def dcn(self, ours: str, theirs: str):
        # no bias: mmcv DeformConv2dPack is bias-free (bias=False default)
        self.add(ours, {
            "weight": (f"{theirs}.weight", cc.dcn_weight, _inv(cc.dcn_weight)),
        })
        self.raw_conv(f"{ours}/conv_offset", f"{theirs}.conv_offset", 2,
                      bias=True)

    def depth_net(self, ours: str, theirs: str):
        """ref DepthNet (ViewTransformerLSSBEVDepth.py:457-517).
        depth_conv Sequential: 0-2 BasicBlocks, 3 ASPP, 4 DCN, 5 Conv2d."""
        self.conv_nd(f"{ours}/reduce_conv", f"{theirs}.reduce_conv.0", 2)
        self.groupnorm(f"{ours}/reduce_gn", f"{theirs}.reduce_conv.1")
        self.groupnorm(f"{ours}/bn", f"{theirs}.bn")
        self.mlp(f"{ours}/depth_mlp", f"{theirs}.depth_mlp")
        self.mlp(f"{ours}/context_mlp", f"{theirs}.context_mlp")
        self.se_layer(f"{ours}/depth_se", f"{theirs}.depth_se")
        self.se_layer(f"{ours}/context_se", f"{theirs}.context_se")
        self.conv_nd(f"{ours}/context_conv", f"{theirs}.context_conv", 2)
        for i in range(3):
            self.basicblock2d(f"{ours}/block{i}", f"{theirs}.depth_conv.{i}")
        self.aspp(f"{ours}/aspp", f"{theirs}.depth_conv.3")
        self.dcn(f"{ours}/dcn", f"{theirs}.depth_conv.4")
        self.conv_nd(f"{ours}/depth_pred", f"{theirs}.depth_conv.5", 2)

    def bri_attention(self, ours: str, theirs: str):
        """ref attention.py:45-56: 1x1x1 convs on C=1 -> scalar affine."""
        for name in ("query", "key", "value"):
            self.add(ours, {
                f"{name}_w": (
                    f"{theirs}.{name}_conv.weight",
                    lambda w: np.asarray(w).reshape(1),
                    lambda w: np.asarray(w).reshape(1, 1, 1, 1, 1),
                ),
                f"{name}_b": (f"{theirs}.{name}_conv.bias",
                              _identity, _identity),
            })
        self.add(ours, {"gamma": (f"{theirs}.gamma", _identity, _identity)})

    def ca3d(self, ours: str, theirs: str):
        """ref attention.py:90-120 (conv2 squeeze convs are 1x1x1 -> Dense)."""
        self.conv_nd(f"{ours}/conv1", f"{theirs}.conv1.0", 3)
        self.groupnorm(f"{ours}/gn1", f"{theirs}.conv1.2")
        self.dense(f"{ours}/fc_reduce", f"{theirs}.conv2.0", from_conv=3)
        self.dense(f"{ours}/fc_expand", f"{theirs}.conv2.2", from_conv=3)
        self.conv_nd(f"{ours}/conv2", f"{theirs}.conv.0", 3)
        self.groupnorm(f"{ours}/gn2", f"{theirs}.conv.2")


def build_name_map(
    backbone_stage_blocks: List[int],
    resnet_blocks: List[int] = (2, 2, 2),
    num_neck_levels: int = 5,
    num_3d_levels: int = 3,
    se_blocks: bool = True,
) -> NameMap:
    """Name map for the active BEVDepthOccupancy architecture.

    Args:
      backbone_stage_blocks: blocks per EfficientNet stage (b7: [4,7,7,20,17]).
    """
    m = NameMap()

    # ---- image backbone (mmcls CustomEfficientNet: layers.0 stem,
    #      layers.1..5 stages, layers.6 head conv) ----
    def conv_module(ours, theirs):
        m.raw_conv(f"{ours}/conv", f"{theirs}.conv", 2)
        m.batchnorm(f"{ours}/bn", f"{theirs}.bn")

    bb = "img_backbone"
    tb = "img_backbone.layers"
    conv_module(f"{bb}/stem", f"{tb}.0")
    for s, n_blocks in enumerate(backbone_stage_blocks, start=1):
        for j in range(n_blocks):
            ours = f"{bb}/stage{s}_block{j}"
            theirs = f"{tb}.{s}.{j}"
            # expand conv exists when mid != in (all blocks except stage1's)
            if s > 1:
                conv_module(f"{ours}/expand_conv", f"{theirs}.expand_conv")
            conv_module(f"{ours}/depthwise_conv", f"{theirs}.depthwise_conv")
            if se_blocks:
                m.dense(f"{ours}/se/conv1", f"{theirs}.se.conv1.conv",
                        from_conv=2)
                m.dense(f"{ours}/se/conv2", f"{theirs}.se.conv2.conv",
                        from_conv=2)
            conv_module(f"{ours}/linear_conv", f"{theirs}.linear_conv")
    conv_module(f"{bb}/head", f"{tb}.6")

    # ---- image neck (mmdet3d SECONDFPN: deblocks.i = [resample, BN, ReLU]);
    #      level 0 has fractional stride -> Conv2d, others ConvTranspose2d ----
    for i in range(num_neck_levels):
        theirs = f"img_neck.deblocks.{i}"
        if i == 0:
            m.conv_nd(f"img_neck/deblock{i}_conv", f"{theirs}.0", 2,
                      bias=False)
        else:
            m.deconv(f"img_neck/deblock{i}_deconv", f"{theirs}.0", 2)
        m.batchnorm(f"img_neck/deblock{i}_bn", f"{theirs}.1")

    # ---- view transformer ----
    vt = "img_view_transformer"
    m.depth_net(f"{vt}/depth_net", f"{vt}.depth_net")

    sv = f"{vt}/stereo_volume_net"
    tsv = f"{vt}.stereo_volume_net"
    fw = f"{sv}/feature_withcam"
    tfw = f"{tsv}.feature_withcam"
    m.conv_nd(f"{fw}/reduce_conv", f"{tfw}.reduce_conv.0", 2)
    m.groupnorm(f"{fw}/reduce_gn", f"{tfw}.reduce_conv.1")
    m.mlp(f"{fw}/depth_mlp", f"{tfw}.depth_mlp")
    m.se_layer(f"{fw}/depth_se", f"{tfw}.depth_se")
    m.conv_nd(f"{fw}/depth_conv", f"{tfw}.depth_conv.0", 2)

    # dres0/1 are Sequential(convbn, ReLU, convbn[, ReLU])
    m.convgn3d(f"{sv}/dres0_0", f"{tsv}.dres0.0")
    m.convgn3d(f"{sv}/dres0_1", f"{tsv}.dres0.2")
    m.convgn3d(f"{sv}/dres1_0", f"{tsv}.dres1.0")
    m.convgn3d(f"{sv}/dres1_1", f"{tsv}.dres1.2")
    for i, name in enumerate(("dres2", "dres3", "dres4")):
        m.hourglass(f"{sv}/{name}", f"{tsv}.{name}")
    m.convgn3d(f"{sv}/classif3_1", f"{tsv}.classif3_1.0")
    m.conv_nd(f"{sv}/classif3_2", f"{tsv}.classif3_2.0", 3, bias=False)

    vi = f"{vt}/volume_interaction"
    tvi = f"{vt}.volume_interaction"
    m.bri_attention(f"{vi}/lss2stereo", f"{tvi}.lss2stereo")
    m.bri_attention(f"{vi}/stereo2lss", f"{tvi}.stereo2lss")
    m.conv_nd(f"{vi}/redir1", f"{tvi}.redir1", 3)
    m.conv_nd(f"{vi}/redir2", f"{tvi}.redir2", 3)
    m.hourglass(f"{vi}/dres1", f"{tvi}.dres1")
    m.ca3d(f"{vi}/ca3d", f"{tvi}.CA3D.fn")
    m.add(vi, {"ca3d_alpha": (f"{tvi}.CA3D.alpha", _identity, _identity)})

    # ---- 3D encoder (CustomResNet3D) ----
    bev = "img_bev_encoder_backbone"
    m.conv_nd(f"{bev}/input_proj_conv", f"{bev}.input_proj.0", 3, bias=False)
    m.groupnorm(f"{bev}/input_proj_gn", f"{bev}.input_proj.1")
    for s, n_blocks in enumerate(resnet_blocks):
        for j in range(n_blocks):
            ours = f"{bev}/layer{s}_block{j}"
            theirs = f"{bev}.layers.{s}.{j}"
            m.conv_nd(f"{ours}/conv1", f"{theirs}.conv1", 3, bias=False)
            m.groupnorm(f"{ours}/gn1", f"{theirs}.bn1")
            m.conv_nd(f"{ours}/conv2", f"{theirs}.conv2", 3, bias=False)
            m.groupnorm(f"{ours}/gn2", f"{theirs}.bn2")
            if j == 0 and s > 0:
                # stage entry downsample projection (stage 0 is stride-1 at
                # matching width -> no downsample, ref resnet3d.py:188-198)
                m.conv_nd(f"{ours}/downsample_conv",
                          f"{theirs}.downsample.0", 3, bias=False)
                m.groupnorm(f"{ours}/downsample_gn",
                            f"{theirs}.downsample.1")

    # ---- 3D neck (SECONDFPN3D) ----
    for i in range(num_3d_levels):
        m.deconv(f"img_bev_encoder_neck/deblock{i}_deconv",
                 f"img_bev_encoder_neck.deblocks.{i}.0", 3)
        m.groupnorm(f"img_bev_encoder_neck/deblock{i}_gn",
                    f"img_bev_encoder_neck.deblocks.{i}.1")

    # ---- head ----
    m.conv_nd("pts_bbox_head/occ_conv0_0", "pts_bbox_head.occ_convs.0.0", 3,
              bias=False)
    m.groupnorm("pts_bbox_head/occ_conv0_gn", "pts_bbox_head.occ_convs.0.1")
    m.conv_nd("pts_bbox_head/occ_conv0_1", "pts_bbox_head.occ_convs.0.3", 3,
              bias=False)
    return m


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def convert_reference_checkpoint(
    state_dict: Dict[str, np.ndarray],
    name_map: NameMap,
    target_params: Dict,
    target_stats: Dict,
    strict: bool = True,
):
    """Map a reference state_dict onto our param/stat trees.

    Every leaf of the targets must be produced (strict), shapes must match,
    and — also under strict — every state_dict entry must be consumed
    (BN ``num_batches_tracked`` counters and checkpoint bookkeeping are
    tolerated noise): a real checkpoint with renamed/extra modules fails
    loudly with a readable diff instead of silently loading a partial
    model. Half-precision checkpoints are fine — values are cast to the
    target leaf dtype after the layout transform. Returns
    (params, batch_stats)."""
    flat_p = _flatten(target_params)
    flat_s = _flatten(target_stats)
    consumed = set()

    def fill(flat_target, rules):
        out = {}
        missing = []
        for path, leaf in flat_target.items():
            rule = rules.get(path)
            if rule is None:
                missing.append(path)
                continue
            tkey, fwd, _ = rule
            if tkey not in state_dict:
                missing.append(f"{path} <- {tkey} (absent)")
                continue
            consumed.add(tkey)
            arr = fwd(np.asarray(state_dict[tkey], dtype=np.float32))
            if tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"{path}: converted shape {arr.shape} != {leaf.shape} "
                    f"(from {tkey})"
                )
            out[path] = arr.astype(np.asarray(leaf).dtype
                                   if hasattr(leaf, "dtype") else np.float32)
        if strict and missing:
            raise KeyError(
                f"{len(missing)} unmapped leaves, first 10: {missing[:10]}"
            )
        return out

    new_p = fill(flat_p, name_map.params)
    new_s = fill(flat_s, name_map.stats)

    if strict:
        known = {r[0] for r in name_map.params.values()}
        known |= {r[0] for r in name_map.stats.values()}
        unexpected = sorted(
            k for k in state_dict
            if k not in consumed and k not in known and not _NOISE_KEY.search(k)
        )
        if unexpected:
            lines = []
            for k in unexpected[:10]:
                close = difflib.get_close_matches(k, known, n=1)
                hint = f"  (closest mapped key: {close[0]})" if close else ""
                lines.append(f"  {k}{hint}")
            raise KeyError(
                f"{len(unexpected)} unexpected state_dict keys not consumed "
                f"by the name map (first 10 below). If the checkpoint was "
                f"saved after fuse_conv_bn, run adapt_fused_state_dict() "
                f"first.\n" + "\n".join(lines)
            )

    def unflatten(flat):
        tree: Dict = {}
        for path, v in flat.items():
            cc.set_in(tree, path, v)
        return tree

    return unflatten(new_p), unflatten(new_s)


def _default_bn_eps(torch_key: str) -> float:
    """BN epsilon by module: the EfficientNet backbone uses 1e-3
    (models/efficientnet.py:349), every other BatchNorm 1e-5
    (models/layers.py BatchNorm default)."""
    return 1e-3 if torch_key.startswith("img_backbone.") else 1e-5


def adapt_fused_state_dict(
    state_dict: Dict[str, np.ndarray],
    name_map: NameMap,
    eps_for: Callable[[str], float] = _default_bn_eps,
    target_stats: Dict = None,
) -> Dict[str, np.ndarray]:
    """Adapt a checkpoint saved after the reference's ``fuse_conv_bn``
    (tools/misc/fuse_conv_bn.py) to the unfused name map.

    Torch-side fusing folds each BN into its conv — the conv kernel is
    rescaled, a ``.bias`` appears on a previously bias-free conv, and the
    BN module is replaced by Identity (its keys vanish). This function
    structurally inverts that: for every BN module the map expects but the
    checkpoint lacks, it finds the fused conv (the unconsumed ``.bias``
    whose torch key shares the longest prefix with the BN and whose length
    matches the BN width), moves that bias into the BN's beta, and installs
    identity statistics (gamma=1, mean=0, var=1-eps) so the reconstructed
    model computes exactly what the fused torch model did. The conv kernel
    keeps its fused scaling. Returns a new state_dict; the original is not
    modified.

    Pass ``target_stats`` (the flax batch_stats tree) to pin each BN's
    expected width: candidates whose bias length differs are skipped, and a
    tie between two width-compatible candidates raises instead of silently
    installing the first one's beta (advisor round-4 finding — a parent
    module holding several equal-width fused convs with no digit
    correspondence must fail loudly, not guess)."""
    sd = dict(state_dict)
    stat_widths = None
    if target_stats is not None:
        stat_widths = {
            p: int(np.asarray(leaf).shape[0])
            for p, leaf in _flatten(target_stats).items()
        }
    known = {r[0] for r in name_map.params.values()}
    known |= {r[0] for r in name_map.stats.values()}
    # unconsumed conv biases = fused-BN residue candidates
    loose_biases = [
        k for k in sd
        if k.endswith(".bias") and k not in known
        and f"{k[:-5]}.weight" in known
    ]
    for path, (tkey, _, _) in sorted(name_map.stats.items()):
        if not tkey.endswith(".running_mean") or tkey in sd:
            continue
        bn_module = tkey[: -len(".running_mean")]
        # the fused conv is a Sequential/named sibling of the BN: require
        # the candidate bias to live under the BN's parent module; prefer
        # an index-matched sibling (bn1<->conv1; Sequential .1<->.0), then
        # longest common prefix
        parent, bn_comp = bn_module.rsplit(".", 1)
        parent += "."
        bn_digit = re.search(r"(\d+)$", bn_comp)
        bn_width = stat_widths.get(path) if stat_widths else None
        best, best_score, tied = None, (-1, -1), None
        for cand in loose_biases:
            if cand not in sd or not cand.startswith(parent):
                continue  # claimed by an earlier BN / different module
            if bn_width is not None and np.asarray(
                sd[cand]
            ).shape[0] != bn_width:
                continue  # fused-conv bias width must equal the BN width
            comp = cand[: -len(".bias")][len(parent):].split(".", 1)[0]
            digit = re.search(r"(\d+)$", comp)
            if bn_comp.isdigit() and comp.isdigit():
                idx_match = int(comp) == int(bn_comp) - 1
            elif bn_digit and digit:
                idx_match = digit.group(1) == bn_digit.group(1)
            else:
                idx_match = False
            lcp = 0
            for a, b in zip(bn_module, cand):
                if a != b:
                    break
                lcp += 1
            score = (1 if idx_match else 0, lcp)
            if score > best_score:
                best, best_score, tied = cand, score, None
            elif score == best_score:
                tied = cand
        if best is None:
            continue  # leave missing; convert() reports it readably
        if tied is not None:
            raise ValueError(
                f"fused-BN adaptation is ambiguous for {bn_module}: "
                f"candidate conv biases {best!r} and {tied!r} tie on "
                f"(index-match, common-prefix) score {best_score}; rename "
                f"or pre-assign one of them in the state_dict"
            )
        bias = np.asarray(sd.pop(best), np.float32)
        width = bias.shape[0]
        eps = eps_for(bn_module)
        sd[f"{bn_module}.weight"] = np.ones(width, np.float32)
        sd[f"{bn_module}.bias"] = bias
        sd[f"{bn_module}.running_mean"] = np.zeros(width, np.float32)
        sd[f"{bn_module}.running_var"] = np.full(width, 1.0 - eps, np.float32)
    return sd


def synthesize_state_dict(
    name_map: NameMap, target_params: Dict, target_stats: Dict, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Build a fake torch state_dict whose converted values exactly equal
    random arrays of our shapes (round-trip / completeness testing)."""
    rng = np.random.RandomState(seed)
    sd = {}
    for flat_target, rules in (
        (_flatten(target_params), name_map.params),
        (_flatten(target_stats), name_map.stats),
    ):
        for path, leaf in flat_target.items():
            rule = rules.get(path)
            if rule is None:
                continue
            tkey, _, inv = rule
            ours = rng.randn(*np.asarray(leaf).shape).astype(np.float32)
            sd[tkey] = inv(ours)
    return sd
