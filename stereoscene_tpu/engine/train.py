"""Training orchestration: one pjit-compiled step over the device mesh.

Replaces the reference's mmcv EpochBasedRunner + MMDistributedDataParallel
stack (ref: occupancy/apis/mmdet_train.py:28-198) with a functional JAX
design:

- ``TrainState``: params + optimizer state + batch stats in one pytree.
- ``compute_losses``: the active loss recipe — depth BCE (weight 1.0,
  ref: bevdepth_occupancy.py:229-230) + voxel CE / sem_scal / geo_scal at
  configurable weights (ref: occhead.py:291-343, config stereoscene.py:115-122),
  with the trilinear upsample to the GT grid inside the loss
  (ref: occhead.py:291-294).
- ``make_train_step``: value_and_grad + AdamW(lr 1e-4, wd 0.01) with global
  grad-norm clip 5 and a step LR schedule dropping 10x at epochs [20, 25]
  (ref config stereoscene.py:203-218). Gradients are averaged across the
  mesh implicitly: the batch is sharded over the 'data' axis and parameters
  are replicated, so XLA inserts the all-reduce (the DDP equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .. import metrics as ssc_metrics
from ..losses import (
    bce_depth_loss,
    ce_ssc_loss,
    class_weights_from_frequencies,
    geo_scal_loss,
    lovasz_softmax,
    ohem_ce_ssc_loss,
    sem_scal_loss,
)
from ..ops.resize import resize_trilinear


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None
                else self.batch_stats
            ),
        )


def step_lr_schedule(
    base_lr: float, steps_per_epoch: int, milestones=(20, 25), gamma=0.1,
    warmup_steps: int = 0, warmup_ratio: float = 1.0 / 3.0,
) -> optax.Schedule:
    """Epoch-step LR decay (ref config stereoscene.py:211-215) with optional
    mmcv-style linear warmup (LrUpdaterHook warmup='linear':
    lr * (1 - (1 - i/warmup_iters) * (1 - warmup_ratio)) for the first
    warmup_iters steps; off in the active recipe, exposed as the runner's
    escape hatch)."""
    boundaries = {m * steps_per_epoch: gamma for m in milestones}
    decay = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_steps <= 0:
        return decay

    def schedule(step):
        frac = jnp.minimum(step / warmup_steps, 1.0)
        warm = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
        return decay(step) * warm

    return schedule


def efficientnet_frozen_predicate(
    frozen_stages: int, backbone_name: str = "img_backbone"
) -> Callable[[str], bool]:
    """Path predicate matching the reference's backbone ``frozen_stages``
    semantics (mmcls EfficientNet freezes ``layers[:frozen_stages]`` where
    layer 0 is the stem and layer k is block stage k). Returns True for
    parameter paths that must receive zero updates."""

    def predicate(path: str) -> bool:
        parts = path.split("/")
        if backbone_name not in parts:
            return False
        for p in parts:
            if p == "stem" and frozen_stages >= 1:
                return True
            if p.startswith("stage") and "_block" in p:
                stage = int(p[len("stage"):p.index("_")])
                return stage <= frozen_stages - 1
        return False

    return predicate


def _freeze_labels(params, predicate: Callable[[str], bool]):
    """'train'/'frozen' label tree for optax.multi_transform."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    labels = {
        k: "frozen" if predicate("/".join(str(p) for p in k)) else "train"
        for k in flat
    }
    return traverse_util.unflatten_dict(labels)


def create_train_state(
    model,
    variables,
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    grad_clip: float = 5.0,
    steps_per_epoch: int = 1,
    milestones=(20, 25),
    frozen_predicate: Optional[Callable[[str], bool]] = None,
    warmup_steps: int = 0,
    warmup_ratio: float = 1.0 / 3.0,
    accumulate_steps: int = 1,
) -> TrainState:
    """``frozen_predicate`` (path string -> bool) implements the reference's
    ``frozen_stages`` backbone freezing (ref efficientnet.py frozen_stages /
    mmcls _freeze_stages): matching parameters get zero updates via
    optax.multi_transform. Note frozen-stage BatchNorm *statistics* still
    update during training (the reference's norm_eval flag is a separate
    concern, off in the active config).

    ``warmup_steps``/``warmup_ratio`` enable mmcv-style linear LR warmup and
    ``accumulate_steps > 1`` enables gradient accumulation
    (optax.MultiSteps — mmcv GradientCumulativeOptimizerHook equivalent);
    both default off, matching the reference recipe."""
    schedule = step_lr_schedule(
        lr, steps_per_epoch, milestones,
        warmup_steps=warmup_steps, warmup_ratio=warmup_ratio,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay, b1=0.9, b2=0.999),
    )
    params = variables["params"]
    if frozen_predicate is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            _freeze_labels(params, frozen_predicate),
        )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Weights mirror semkitti_loss_weight_cfg (stereoscene.py:115-122)."""

    voxel_ce: float = 1.0
    voxel_sem_scal: float = 1.0
    voxel_geo_scal: float = 1.0
    voxel_ohem: float = 0.0
    voxel_lovasz: float = 0.0
    voxel_dice: float = 0.0
    voxel_lga: float = 0.0
    loss_depth_weight: float = 1.0
    loss_depth_type: str = "bce"  # 'bce' | 'kld' (ref :405-416)
    loss_seg_weight: float = 0.0  # imgseg aux head (ref :418-430)
    loss_crp_weight: float = 0.0  # CRP3D relation loss (ref resnet3d.py:213)
    # point-supervision losses on the OccHead point branch
    # (ref occhead.py:363-399 loss_point_single; CE ignore_index=0,
    # lovasz ignore=0)
    loss_point_ce_weight: float = 0.0
    loss_point_lovasz_weight: float = 0.0
    ohem_topk: float = 0.25
    downsample: int = 8
    dbound: Tuple[float, float, float] = (2.0, 58.0, 0.5)
    # > 0 enables the scan-over-Y-slabs streaming evaluation of the
    # ce/sem_scal/geo_scal triple (losses/streaming.py): the 2x-upsampled
    # fp32 logits never exist at full size. Exact same math; required for
    # the 512x512x64 variant whose upsampled loss tensors (>1.3 GB/shard
    # before softmax copies) thrash compiler liveness (PERF.md round 3).
    # Only valid when the extra losses (ohem/lovasz/dice/lga) are off.
    stream_voxel_chunks: int = 0


def compute_losses(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cfg: LossConfig,
) -> Dict[str, jnp.ndarray]:
    """All loss terms for one batch. ``batch['gt_occ']`` is [B, X, Y, Z]
    (255=ignore); ``batch['gt_depth']`` is [B, N, H, W] sparse LiDAR depth."""
    losses = {}
    class_weights = class_weights_from_frequencies()
    gt = batch["gt_occ"]

    for level, logits in enumerate(outputs["output_voxels"]):
        tag = str(level)
        if cfg.stream_voxel_chunks > 0:
            if any((cfg.voxel_ohem, cfg.voxel_lovasz, cfg.voxel_dice,
                    cfg.voxel_lga)):
                raise ValueError(
                    "stream_voxel_chunks only covers ce/sem_scal/geo_scal; "
                    "disable ohem/lovasz/dice/lga or the streaming path"
                )
            from ..losses.streaming import streaming_voxel_losses

            terms = streaming_voxel_losses(
                logits, gt, class_weights, cfg.stream_voxel_chunks
            )
            if cfg.voxel_ce > 0:
                losses[f"loss_voxel_ce_{tag}"] = cfg.voxel_ce * terms["ce"]
            if cfg.voxel_sem_scal > 0:
                losses[f"loss_voxel_sem_scal_{tag}"] = (
                    cfg.voxel_sem_scal * terms["sem_scal"]
                )
            if cfg.voxel_geo_scal > 0:
                losses[f"loss_voxel_geo_scal_{tag}"] = (
                    cfg.voxel_geo_scal * terms["geo_scal"]
                )
            continue
        if logits.shape[1:4] != gt.shape[1:4]:
            logits = resize_trilinear(
                logits.astype(jnp.float32), gt.shape[1:4]
            )
        if cfg.voxel_ce > 0:
            losses[f"loss_voxel_ce_{tag}"] = cfg.voxel_ce * ce_ssc_loss(
                logits, gt, class_weights
            )
        if cfg.voxel_sem_scal > 0:
            losses[f"loss_voxel_sem_scal_{tag}"] = (
                cfg.voxel_sem_scal * sem_scal_loss(logits, gt)
            )
        if cfg.voxel_geo_scal > 0:
            losses[f"loss_voxel_geo_scal_{tag}"] = (
                cfg.voxel_geo_scal * geo_scal_loss(logits, gt)
            )
        if cfg.voxel_ohem > 0:
            losses[f"loss_voxel_ohem_{tag}"] = cfg.voxel_ohem * (
                ohem_ce_ssc_loss(logits, gt, class_weights, cfg.ohem_topk)
            )
        if cfg.voxel_lovasz > 0:
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            losses[f"loss_voxel_lovasz_{tag}"] = cfg.voxel_lovasz * (
                lovasz_softmax(probs, gt, ignore=255)
            )
        if cfg.voxel_dice > 0:
            from ..losses import soft_dice_loss

            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            losses[f"loss_voxel_dice_{tag}"] = cfg.voxel_dice * (
                soft_dice_loss(1.0 - probs[..., 0], gt)
            )
        if cfg.voxel_lga > 0:
            from ..losses import position_aware_loss

            losses[f"loss_voxel_lga_{tag}"] = cfg.voxel_lga * (
                position_aware_loss(logits, gt, class_weights)
            )

    if cfg.loss_depth_weight > 0 and "gt_depth" in batch:
        # depth_prob: [B, D, fH, fW] -> [B*N, fH, fW, D] with N=1
        dp = outputs["depth_prob"].transpose(0, 2, 3, 1)
        if cfg.loss_depth_type == "kld":
            from ..losses import klv_depth_loss

            losses["loss_depth"] = cfg.loss_depth_weight * klv_depth_loss(
                batch["gt_depth"][:, :1], dp, cfg.downsample, cfg.dbound
            )
        else:
            losses["loss_depth"] = cfg.loss_depth_weight * bce_depth_loss(
                batch["gt_depth"][:, :1], dp, cfg.downsample, cfg.dbound
            )

    if (
        cfg.loss_seg_weight > 0
        and outputs.get("imgseg_logits") is not None
        and "img_seg" in batch
    ):
        # image-view seg CE, class-frequency weighted, ignore 0 (ref :418-430)
        seg_logits = outputs["imgseg_logits"].astype(jnp.float32)
        seg_gt = batch["img_seg"][:, 0]  # left camera
        fh, fw = seg_logits.shape[1:3]
        b, gh, gw = seg_gt.shape
        # nearest downsample of labels to the feature grid
        ys = (jnp.arange(fh) * gh) // fh
        xs = (jnp.arange(fw) * gw) // fw
        seg_gt = seg_gt[:, ys][:, :, xs].astype(jnp.int32)
        valid = seg_gt != 0
        logp = jax.nn.log_softmax(seg_logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.where(valid, seg_gt, 0)[..., None], axis=-1
        )[..., 0]
        w = jnp.asarray(class_weights, jnp.float32)[
            jnp.where(valid, seg_gt, 0)
        ]
        w = jnp.where(valid, w, 0.0)
        losses["loss_imgseg"] = cfg.loss_seg_weight * (
            jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
        )

    if (
        cfg.loss_crp_weight > 0
        and outputs.get("crp_logits") is not None
        and "cp_mega_matrix" in batch
    ):
        from ..models.crp3d import crp_relation_loss

        losses["loss_rel_ce"] = cfg.loss_crp_weight * crp_relation_loss(
            outputs["crp_logits"], batch["cp_mega_matrix"]
        )

    if (
        (cfg.loss_point_ce_weight > 0 or cfg.loss_point_lovasz_weight > 0)
        and outputs.get("output_points") is not None
        and "points_occ" in batch
    ):
        # point supervision (ref occhead.py:363-399): targets are the
        # labels column of points_occ; label 0 is ignored (the reference's
        # CrossEntropyLoss(ignore_index=0) / lovasz ignore=0); padded slots
        # beyond points_count are masked out.
        logits = outputs["output_points"].astype(jnp.float32)  # [B, P, C]
        target = batch["points_occ"][..., -1].astype(jnp.int32)  # [B, P]
        p = target.shape[1]
        in_count = (
            jnp.arange(p)[None, :] < batch["points_count"][:, None]
            if "points_count" in batch
            else jnp.ones_like(target, bool)
        )
        valid = in_count & (target != 0)
        safe_t = jnp.where(valid, target, 0)
        if cfg.loss_point_ce_weight > 0:
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[
                ..., 0
            ]
            losses["loss_point_ce"] = cfg.loss_point_ce_weight * (
                jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            )
        if cfg.loss_point_lovasz_weight > 0:
            from ..losses.lovasz import lovasz_softmax

            probs = jax.nn.softmax(logits, axis=-1)
            # fold the padding into the ignore label (0)
            labels = jnp.where(in_count, target, 0)
            losses["loss_point_lovasz"] = (
                cfg.loss_point_lovasz_weight
                * lovasz_softmax(probs, labels, ignore=0)
            )
    return losses


def make_train_step(
    model,
    loss_cfg: LossConfig,
    axis_name: Optional[str] = None,
    bf16: bool = False,
    debug_grads: bool = False,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, logs). Designed to be
    wrapped in jax.jit with shardings (batch sharded over 'data', state
    replicated) — XLA inserts the gradient all-reduce automatically.

    ``bf16=True`` is the mixed-precision policy (the reference's fp16 path,
    ref tools/fp16/train.py + Fp16OptimizerHook mmdet_train.py:130-138):
    fp32 master params are cast to bf16 for the forward/backward; losses,
    normalization statistics, and softmaxes stay fp32 inside the model."""

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            if bf16:
                apply_params = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x,
                    params,
                )
                batch_c = dict(batch)
                batch_c["imgs"] = batch["imgs"].astype(jnp.bfloat16)
            else:
                apply_params = params
                batch_c = batch
            variables = {"params": apply_params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            outputs, mutated = model.apply(
                variables,
                batch_c,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            losses = compute_losses(outputs, batch, loss_cfg)
            total = sum(losses.values())
            new_stats = mutated.get("batch_stats") if mutated else None
            return total, (losses, new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        logs = dict(losses)
        logs["loss_total"] = total
        if debug_grads:
            # GradChecker-equivalent diagnostics
            # (ref: models/hooks/hooks.py debug hooks)
            leaves = jax.tree.leaves(grads)
            logs["grad_norm"] = jnp.sqrt(
                sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves)
            )
            logs["grad_nonfinite"] = sum(
                jnp.sum(~jnp.isfinite(g.astype(jnp.float32))) for g in leaves
            ).astype(jnp.float32)
        return state, logs

    return train_step
