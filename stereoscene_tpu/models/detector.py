"""Top-level stereo occupancy detector.

Rebuild of ``BEVDepthOccupancy``
(ref: occupancy/detectors/bevdepth_occupancy.py:23-359): both stereo views run
through one shared backbone+neck (batch-dim concat, ref :94), features split
into left/right, camera MLP embeddings computed per eye, the view transformer
lifts the LEFT camera's context features through the MIE-fused depth
distribution into the voxel grid, and the 3D encoder + head predict
occupancy logits at [X, Y, Z] = 128x128x16 (upsampled to GT 256x256x32 in
the loss/inference wrapper).

The module is setup-style with three stage methods — ``encode_images``,
``view_transform``, ``bev_encode`` — so callers can jit the full forward
(``__call__``) or compile stage-by-stage (bench.py does this: the flagship
graph in one unit exceeds the remote-compile relay's limits, and stage
compiles also give the reference's per-stage latency table,
ref :252-263 record_time).

Model config mirrors the reference config surface
(configs/occupancy/semantickitti/stereoscene.py:57-126); ``from_config``
accepts that dict schema.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import geometry
from .efficientnet import CustomEfficientNet
from .lss import ViewTransformerLiftSplatShootVoxel
from .occhead import OccHead
from .resnet3d import CustomResNet3D
from .second_fpn import SECONDFPN, SECONDFPN3D


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Static hyperparameters of the active stereoscene model."""

    input_size: Tuple[int, int] = (384, 1280)
    downsample: int = 8
    xbound: Tuple[float, float, float] = (0.0, 51.2, 0.8)
    ybound: Tuple[float, float, float] = (-25.6, 25.6, 0.8)
    zbound: Tuple[float, float, float] = (-2.0, 4.4, 0.8)
    dbound: Tuple[float, float, float] = (2.0, 58.0, 0.5)

    # remat the voxel-side encoder/neck (jax.checkpoint) — needed for the
    # high-res spatially-sharded training variant to fit HBM (the reference
    # only checkpoints the image backbone, with_cp)
    bev_with_cp: bool = False

    backbone_arch: str = "b7"
    backbone_out_indices: Tuple[int, ...] = (2, 3, 4, 5, 6)
    backbone_drop_path_rate: float = 0.2
    backbone_with_cp: bool = True
    neck_in_channels: Tuple[int, ...] = (48, 80, 224, 640, 2560)
    neck_upsample_strides: Tuple[float, ...] = (0.5, 1, 2, 4, 4)
    neck_out_channels: Tuple[int, ...] = (128, 128, 128, 128, 128)

    numC_Trans: int = 128
    cam_channels: int = 30
    voxel_channels: Tuple[int, ...] = (128, 256, 512)
    voxel_out_indices: Tuple[int, ...] = (0, 1, 2)
    voxel_out_channels: Tuple[int, ...] = (128, 128, 128)
    voxel_strides: Tuple[int, ...] = (1, 2, 2)
    fpn3d_upsample_strides: Tuple[int, ...] = (1, 2, 4)
    out_channel: int = 20
    resnet_depth: int = 18
    norm_groups: int = 32
    attention_chunk: int = 1024
    # splat-plan group alignment: host pads each voxel's point run to a
    # multiple of this so the device pre-reduces groups densely and the
    # scatter shrinks group-x (ops/splat_plan.py; exact f32 math).
    # On the flagship KITTI calibration group=8 inflates the plan 4.2x
    # (418k -> 1.76M rows; runs are ~2.6 rows median) yet still wins the
    # bench A/B by ~1 ms/frame (r4: 10.52 vs 10.38 fps; the dense 8-row
    # pre-reduce is cheaper than scattering 2x the rows). PERF.md r4 table.
    splat_group: int = 8
    # optional subsystems (ref: bevdepth_occupancy.py:27 use_grid_mask,
    # ViewTransformerLSSVoxel.py:327-340 imgseg aux head,
    # resnet3d.py:158-165 crp3d) — all off in the scored config
    use_grid_mask: bool = False
    imgseg: bool = False
    imgseg_class: int = 20
    crp3d: bool = False
    crp_mega_shape: Tuple[int, int, int] = (32, 32, 4)
    # OccHead point decoder branch (ref occhead.py:171-218,363-399;
    # supervise_points=False in the scored config stereoscene.py:111)
    supervise_points: bool = False

    @property
    def num_depth(self) -> int:
        lo, hi, step = self.dbound
        return int(round((hi - lo) / step))

    @property
    def feature_size(self) -> Tuple[int, int]:
        return (self.input_size[0] // self.downsample,
                self.input_size[1] // self.downsample)

    @property
    def grid_shape(self) -> Tuple[int, int, int]:
        dx, bx, nx = geometry.gen_dx_bx(self.xbound, self.ybound, self.zbound)
        return (int(nx[0]), int(nx[1]), int(nx[2]))

    @classmethod
    def from_config(cls, cfg: Dict[str, Any]) -> "DetectorConfig":
        """Build from a reference-style config dict (stereoscene.py keys)."""
        model = cfg["model"]
        grid = model["img_view_transformer"]["grid_config"]
        data = model["img_view_transformer"]["data_config"]
        bb = model["img_backbone"]
        neck = model["img_neck"]
        bev_bb = model["img_bev_encoder_backbone"]
        bev_neck = model["img_bev_encoder_neck"]
        head = model["pts_bbox_head"]
        return cls(
            input_size=tuple(data["input_size"]),
            downsample=model["img_view_transformer"]["downsample"],
            xbound=tuple(grid["xbound"]),
            ybound=tuple(grid["ybound"]),
            zbound=tuple(grid["zbound"]),
            dbound=tuple(grid["dbound"]),
            backbone_arch=bb["arch"],
            backbone_out_indices=tuple(bb["out_indices"]),
            backbone_drop_path_rate=bb.get("drop_path_rate", 0.0),
            backbone_with_cp=bb.get("with_cp", False),
            neck_in_channels=tuple(neck["in_channels"]),
            neck_upsample_strides=tuple(neck["upsample_strides"]),
            neck_out_channels=tuple(neck["out_channels"]),
            numC_Trans=model["img_view_transformer"]["numC_Trans"],
            cam_channels=model["img_view_transformer"]["cam_channels"],
            voxel_channels=tuple(bev_bb["block_inplanes"]),
            voxel_out_indices=tuple(bev_bb["out_indices"]),
            voxel_out_channels=tuple(bev_neck["out_channels"]),
            fpn3d_upsample_strides=tuple(bev_neck["upsample_strides"]),
            out_channel=head["out_channel"],
            resnet_depth=bev_bb["depth"],
            use_grid_mask=model.get("use_grid_mask", False),
            norm_groups=bev_bb.get("norm_cfg", {}).get("num_groups", 32),
        )


class BEVDepthOccupancy(nn.Module):
    cfg: DetectorConfig
    # optional sharding-constraint hook applied to the pooled voxel features
    # (spatial sharding of the grid for high-res variants; see
    # parallel/spatial.py). Must be a jit-traceable callable or None.
    voxel_constraint: Any = None

    def setup(self):
        cfg = self.cfg
        self.img_backbone = CustomEfficientNet(
            arch=cfg.backbone_arch,
            out_indices=cfg.backbone_out_indices,
            drop_path_rate=cfg.backbone_drop_path_rate,
            with_cp=cfg.backbone_with_cp,
            # the GSPMD-safe depthwise VJP is needed exactly when the voxel
            # grid is sharded over a spatial mesh axis (partial replication
            # upstream); single-axis DP keeps XLA's standard correct path
            safe_depthwise_vjp=self.voxel_constraint is not None,
        )
        self.img_neck = SECONDFPN(
            in_channels=cfg.neck_in_channels,
            out_channels=cfg.neck_out_channels,
            upsample_strides=cfg.neck_upsample_strides,
        )
        vt_cls = (
            nn.remat(ViewTransformerLiftSplatShootVoxel, static_argnums=(7,))
            if cfg.bev_with_cp else ViewTransformerLiftSplatShootVoxel
        )
        self.img_view_transformer = vt_cls(
            num_depth=cfg.num_depth,
            numC_input=sum(cfg.neck_out_channels),
            numC_Trans=cfg.numC_Trans,
            with_cp=cfg.bev_with_cp,
            cam_channels=cfg.cam_channels,
            grid_shape=cfg.grid_shape,
            attention_chunk=cfg.attention_chunk,
            splat_group=cfg.splat_group,
        )
        resnet3d_cls = (
            nn.remat(CustomResNet3D, static_argnums=(2,))
            if cfg.bev_with_cp else CustomResNet3D
        )
        fpn3d_cls = (
            nn.remat(SECONDFPN3D, static_argnums=(2,))
            if cfg.bev_with_cp else SECONDFPN3D
        )
        self.img_bev_encoder_backbone = resnet3d_cls(
            depth=cfg.resnet_depth,
            num_stage=len(cfg.voxel_channels),
            block_inplanes=cfg.voxel_channels,
            block_strides=cfg.voxel_strides + (2,) * (
                4 - len(cfg.voxel_strides)
            ),
            out_indices=cfg.voxel_out_indices,
            norm_groups=cfg.norm_groups,
            crp3d=cfg.crp3d,
            crp_mega_shape=cfg.crp_mega_shape,
        )
        self.img_bev_encoder_neck = fpn3d_cls(
            in_channels=cfg.voxel_channels,
            out_channels=cfg.voxel_out_channels,
            upsample_strides=cfg.fpn3d_upsample_strides,
            norm_groups=cfg.norm_groups,
        )
        self.pts_bbox_head = OccHead(
            in_channels=[sum(cfg.voxel_out_channels)],
            out_channel=cfg.out_channel,
            num_level=1,
            norm_groups=cfg.norm_groups,
            supervise_points=cfg.supervise_points,
        )
        if cfg.imgseg:
            from .depth_net import BasicBlock2d
            from .layers import Conv2d

            n = sum(cfg.neck_out_channels)
            self.imgseg_block0 = BasicBlock2d(n)
            self.imgseg_block1 = BasicBlock2d(n)
            self.imgseg_head = Conv2d(cfg.imgseg_class, 1)

    # ---- stage 1: shared image encoder over both eyes (ref :94-96) ----
    def encode_images(self, imgs, train: bool = False):
        """imgs: [B, 2, H, W, 3] -> (feat_left, feat_right) [B, fH, fW, C]."""
        cfg = self.cfg
        b = imgs.shape[0]
        # eye-major flattening ([L0..Lb, R0..Rb], matching the reference's
        # batch-dim concat, ref :94) so the [:b]/[b:] split below separates
        # eyes — a plain reshape would interleave samples and eyes and
        # cross-correlate different samples for B > 1
        flat = jnp.swapaxes(imgs, 0, 1).reshape((b * 2,) + imgs.shape[2:])
        if cfg.use_grid_mask and train:
            from ..data.augment import grid_mask

            flat = grid_mask(flat, self.make_rng("dropout"))
        feats = self.img_backbone(flat, train=train)
        neck_out = self.img_neck(feats, train=train)
        return neck_out[:b], neck_out[b:]

    # ---- geometry: voxel ranks for the LEFT camera's frustum ----
    def compute_ranks(self, batch):
        cfg = self.cfg
        frustum = jnp.asarray(
            geometry.create_frustum(cfg.input_size, cfg.downsample, cfg.dbound)
        )
        geom = geometry.get_geometry(
            frustum,
            batch["rots"][:, :1], batch["trans"][:, :1],
            batch["intrins"][:, :1], batch["post_rots"][:, :1],
            batch["post_trans"][:, :1], batch["bda"],
        )[:, 0]
        dx, bx, nx = geometry.gen_dx_bx(cfg.xbound, cfg.ybound, cfg.zbound)
        coords, valid = geometry.voxel_indices(geom, dx, bx, nx)
        ranks = geometry.flatten_voxel_ranks(coords, valid, nx)
        return ranks.reshape(geom.shape[0], -1)

    # ---- stage 2: stereo + mono + MIE + lift-splat ----
    def view_transform(self, feat_left, feat_right, batch, train: bool = False):
        mlp = geometry.get_mlp_input(
            batch["rots"], batch["trans"], batch["intrins"],
            batch["post_rots"], batch["post_trans"], batch["bda"],
        )
        if "splat_order" in batch:
            # host-precomputed static splat plan (ops/splat_plan.py): the
            # argsort + OOB compaction are hoisted out of the compiled step.
            # The plan's group alignment travels as the view transformer's
            # static splat_group attribute (set from cfg above); the
            # SplatPlanCache producer validates the plan against that cfg.
            ranks = (batch["splat_order"], batch["splat_ranks"])
            if "splat_bounds" in batch:
                # static segment boundaries -> scatter-free cumsum splat
                # (ops/voxel_pool.segment_sum_bounds)
                ranks = ranks + (batch["splat_bounds"],)
        else:
            ranks = self.compute_ranks(batch)
        # train positional: nn.remat(static_argnums) ignores keyword args
        return self.img_view_transformer(
            feat_left, feat_right, mlp[:, 0], mlp[:, 1], batch["calib"],
            ranks, train,
        )

    # ---- stage 3: 3D encoder + head (ref :62-81) ----
    def bev_encode(self, voxel_feat, train: bool = False, points=None,
                   img_feats=None, points_uv=None):
        # train passed positionally: nn.remat(static_argnums) does not see
        # keyword args

        # agg4d extension over the BEV stage (round-4 verdict lever 5a):
        # for B=1 inference the whole ResNet3D + FPN3D chain runs on the
        # slice-packed rank-4 [X, Y, Z, C] grid — X is the conv2d batch dim,
        # the depth taps are pad/slice adds (Conv3d's rank-4 dispatch), and
        # the deblock k=s deconvs become 1x1 phase matmuls — so no 5D conv
        # operand exists in the stage. Exact math, identical param tree
        # (tests/test_agg4d.py); the head gets the 5D layout back.
        from .layers import agg4d_enabled

        agg4d = (
            agg4d_enabled(voxel_feat.shape[0], train, self.cfg.bev_with_cp)
            and not self.cfg.crp3d
            and os.environ.get("STEREOSCENE_AGG4D_BEV", "1") != "0"
        )
        if agg4d:
            voxel_feat = voxel_feat[0]
        if self.cfg.crp3d:
            voxel_outs, crp_logits = self.img_bev_encoder_backbone(
                voxel_feat, train
            )
        else:
            voxel_outs = self.img_bev_encoder_backbone(voxel_feat, train)
            crp_logits = None
        fused = self.img_bev_encoder_neck(voxel_outs, train)
        if agg4d:
            fused = fused[None]
        head_out = self.pts_bbox_head(
            [fused], points=points, img_feats=img_feats,
            points_uv=points_uv, train=train,
        )
        return head_out, crp_logits

    def _normalized_points(self, batch):
        """points_occ ego xyz -> [-1, 1]^3 grid coords for the point branch
        (the reference normalizes by point_cloud_range, occhead.py:180-186)."""
        cfg = self.cfg
        lo = jnp.asarray(
            [cfg.xbound[0], cfg.ybound[0], cfg.zbound[0]], jnp.float32
        )
        hi = jnp.asarray(
            [cfg.xbound[1], cfg.ybound[1], cfg.zbound[1]], jnp.float32
        )
        pts = batch["points_occ"][..., :3].astype(jnp.float32)
        return (pts - lo) / (hi - lo) * 2.0 - 1.0

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        """batch keys (channels-last):
          imgs:       [B, 2, H, W, 3]  normalized stereo pair (0=left, 1=right)
          rots:       [B, 2, 3, 3]     cam-to-ego rotation
          trans:      [B, 2, 3]
          intrins:    [B, 2, 3, 4]     KITTI P-matrices
          post_rots:  [B, 2, 3, 3]
          post_trans: [B, 2, 3]
          bda:        [B, 3, 3]
          calib:      [B]              fx * baseline
        """
        feat_left, feat_right = self.encode_images(batch["imgs"], train=train)

        imgseg_logits = None
        if self.cfg.imgseg:
            seg = self.imgseg_block0(feat_left, train=train)
            seg = self.imgseg_block1(seg, train=train)
            imgseg_logits = self.imgseg_head(seg)

        voxel_feat, depth_prob = self.view_transform(
            feat_left, feat_right, batch, train=train
        )
        if self.voxel_constraint is not None:
            voxel_feat = self.voxel_constraint(voxel_feat)
        points = img_feats_for_points = points_uv = None
        if self.cfg.supervise_points and "points_occ" in batch:
            points = self._normalized_points(batch)
            img_feats_for_points = feat_left
            if "points_uv" in batch:
                points_uv = batch["points_uv"][..., :2]
        head_out, crp_logits = self.bev_encode(
            voxel_feat, train=train, points=points,
            img_feats=img_feats_for_points, points_uv=points_uv,
        )

        return {
            "output_voxels": head_out["output_voxels"],
            "output_points": head_out["output_points"],
            "depth_prob": depth_prob,
            "img_feats": feat_left,
            "imgseg_logits": imgseg_logits,
            "crp_logits": crp_logits,
        }
