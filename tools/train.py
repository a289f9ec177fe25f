#!/usr/bin/env python
"""Training CLI.

Equivalent of the reference ``tools/train.py`` (mmcv runner launch): loads a
python config (same schema as the reference's stereoscene.py), builds the
dataset/loader/model/optimizer, and runs the jitted training loop on the
device mesh. Multi-host: pass --coordinator/--num-processes/--process-id (or
let jax.distributed pick up the TPU environment automatically).

Example:
  python tools/train.py stereoscene_tpu/configs/stereoscene_semantickitti.py \
      --work-dir work_dirs/stereoscene
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train a stereoscene_tpu model")
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None,
                   help="deep config overrides, key.path=value "
                        "(mmcv DictAction semantics, ref tools/train.py:69-78)")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deterministic-data", action="store_true")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 forward/backward with fp32 master params "
                        "(the reference's fp16 path)")
    p.add_argument("--save-interval-steps", type=int, default=0,
                   help="async orbax checkpoint every N steps (preemption safety; 0 = epoch-end only)")
    p.add_argument("--trace-dir", default=None,
                   help="write an XLA profiler trace for steps 10-15")
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--spatial-shards", type=int, default=1,
                   help="shard the voxel grid over a 'space' mesh axis with "
                        "this many devices (SP training for high-res "
                        "configs; total devices must be divisible by it)")
    p.add_argument("--coordinator", default=None,
                   help="host:port for jax.distributed.initialize")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import numpy as np

    from stereoscene_tpu.config import Config
    from stereoscene_tpu.data import (
        BatchLoader,
        PipelineConfig,
        SemanticKittiIndex,
        SemanticKittiPipeline,
    )
    from stereoscene_tpu.engine.eval import make_eval_step
    from stereoscene_tpu.engine.loop import run_evaluation, run_training
    from stereoscene_tpu.engine.train import (
        LossConfig,
        create_train_state,
        efficientnet_frozen_predicate,
        make_train_step,
    )
    from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig
    from stereoscene_tpu.parallel.mesh import make_mesh

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        from stereoscene_tpu.config import merge_from_options

        merge_from_options(cfg, args.cfg_options)
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0]
    )
    os.makedirs(work_dir, exist_ok=True)

    det_cfg = DetectorConfig.from_config(cfg)
    if args.spatial_shards > 1:
        # ('data', 'space') mesh: the voxel grid is sharded spatially and
        # GSPMD partitions the 3D encoder's halo exchanges (and their
        # gradient transposes — verified by
        # tests/test_spatial_consistency.py::test_spatial_sharding_gradient_parity)
        from stereoscene_tpu.parallel.spatial import shard_voxels

        n_dev = jax.device_count()
        if n_dev % args.spatial_shards:
            raise SystemExit(
                f"--spatial-shards {args.spatial_shards} does not divide "
                f"{n_dev} devices"
            )
        mesh = make_mesh(axes=("data", "space"), space=args.spatial_shards)
        model = BEVDepthOccupancy(
            cfg=det_cfg, voxel_constraint=lambda v: shard_voxels(v, mesh)
        )
    else:
        mesh = make_mesh()
        model = BEVDepthOccupancy(cfg=det_cfg)

    data_cfg = cfg["data"]
    dcfg = cfg["data_config"]
    pipe_cfg = PipelineConfig(
        input_size=tuple(dcfg["input_size"]),
        resize=tuple(dcfg["resize"]),
        rot=tuple(dcfg["rot"]),
        flip=dcfg["flip"],
        crop_h=tuple(dcfg["crop_h"]),
        resize_test=dcfg.get("resize_test", 0.0),
        is_train=True,
        load_lidar_depth=True,
        point_cloud_range=tuple(cfg["point_cloud_range"]),
    )

    train_index = SemanticKittiIndex(
        data_root=data_cfg["train"]["data_root"],
        ann_file=data_cfg["train"]["ann_file"],
        split="train",
        lidar_root=cfg.get("lidar_root"),
        lidarseg_root=cfg.get("lidarseg_root"),
    )
    if len(train_index) == 0:
        raise SystemExit(
            f"no training frames found under {data_cfg['train']['data_root']} "
            "— run tools/preprocess_kitti.py first"
        )

    # default batch: samples_per_gpu per *data-parallel* device — the
    # 'space' axis replicates the batch, so dividing by spatial_shards keeps
    # per-device activation memory constant (SP exists to buy memory)
    local_data_parallel = max(
        1, jax.local_device_count() // args.spatial_shards
    )
    batch_size = args.batch_size or (
        data_cfg["samples_per_gpu"] * local_data_parallel
    )
    proc_frames = train_index.shard(jax.process_index(), jax.process_count())
    train_loader = BatchLoader(
        proc_frames,
        SemanticKittiPipeline(pipe_cfg, seed=args.seed),
        batch_size=batch_size,
        shuffle=not args.deterministic_data,
        seed=args.seed,
        num_workers=data_cfg.get("workers_per_gpu", 4),
    )

    # init model + optimizer
    example = next(iter(train_loader))
    example_one = jax.tree.map(lambda x: x[:1], example)
    variables = jax.jit(
        lambda k: model.init(k, example_one, train=False)
    )(jax.random.PRNGKey(args.seed))
    opt_cfg = cfg["optimizer"]
    lr_steps = cfg["lr_config"]["step"]
    frozen_stages = cfg["model"]["img_backbone"].get("frozen_stages", 0)
    state = create_train_state(
        model,
        variables,
        lr=opt_cfg["lr"],
        weight_decay=opt_cfg["weight_decay"],
        grad_clip=cfg["optimizer_config"]["grad_clip"]["max_norm"],
        steps_per_epoch=len(train_loader),
        milestones=tuple(lr_steps),
        frozen_predicate=(
            efficientnet_frozen_predicate(frozen_stages)
            if frozen_stages and frozen_stages > 0 else None
        ),
    )

    loss_w = cfg["model"]["pts_bbox_head"]["semkitti_loss_weight_cfg"]
    loss_cfg = LossConfig(
        voxel_ce=loss_w.get("voxel_ce", 1.0),
        voxel_sem_scal=loss_w.get("voxel_sem_scal", 1.0),
        voxel_geo_scal=loss_w.get("voxel_geo_scal", 1.0),
        voxel_ohem=loss_w.get("voxel_ohem", 0.0),
        voxel_lovasz=loss_w.get("voxel_lovasz", 0.0),
        stream_voxel_chunks=loss_w.get("stream_voxel_chunks", 0),
        loss_depth_weight=cfg["model"]["img_view_transformer"].get(
            "loss_depth_weight", 1.0
        ),
        downsample=det_cfg.downsample,
        dbound=det_cfg.dbound,
    )
    train_step = make_train_step(model, loss_cfg, bf16=args.bf16)
    # mesh was built alongside the model above (data-only, or
    # ('data','space') when --spatial-shards > 1)

    # eval closure (every `evaluation.interval` epochs)
    def eval_fn(state):
        eval_pipe = PipelineConfig(
            input_size=pipe_cfg.input_size, is_train=False,
            point_cloud_range=pipe_cfg.point_cloud_range,
        )
        eval_index = SemanticKittiIndex(
            data_root=data_cfg["val"]["data_root"],
            ann_file=data_cfg["val"]["ann_file"],
            split="val",
        )
        eval_loader = BatchLoader(
            eval_index.shard(jax.process_index(), jax.process_count()),
            SemanticKittiPipeline(eval_pipe),
            batch_size=max(1, batch_size // 2),
            shuffle=False,
            drop_last=False,
        )
        eval_step = make_eval_step(model, tuple(cfg["occ_size"]))
        # eval is aug-free with identity BDA -> static splat plans apply
        from stereoscene_tpu.ops.splat_plan import SplatPlanCache

        eval_loader = SplatPlanCache(
            model, int(np.prod(det_cfg.grid_shape))
        ).wrap(eval_loader)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return run_evaluation(model, variables, eval_step, eval_loader)

    run_training(
        model,
        state,
        train_step,
        train_loader,
        eval_fn=eval_fn,
        mesh=mesh,
        max_epochs=args.max_epochs or cfg["runner"]["max_epochs"],
        eval_interval=cfg["evaluation"]["interval"],
        work_dir=work_dir,
        seed=args.seed,
        profile=args.profile,
        trace_dir=args.trace_dir,
        save_interval_steps=args.save_interval_steps,
    )


if __name__ == "__main__":
    main()
