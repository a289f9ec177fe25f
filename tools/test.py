#!/usr/bin/env python
"""Evaluation / submission CLI.

Equivalent of the reference ``tools/test.py`` + ``custom_single_gpu_test``
(ref: occupancy/apis/test.py:66-139): runs jitted inference over the chosen
split, streams SSC metrics, prints the per-class table, and optionally
writes SemanticKITTI benchmark submission ``.label`` files (argmax ->
inverse label map, ref test.py:49-64).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a stereoscene_tpu model")
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None,
                   help="deep config overrides, key.path=value "
                        "(mmcv DictAction semantics, ref tools/train.py:69-78)")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (work_dir/ckpts)")
    p.add_argument("--split", default="val", choices=["val", "test", "test_submit"])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--submission-dir", default=None,
                   help="write benchmark .label files here")
    p.add_argument("--save-pred-dir", default=None,
                   help="dump per-frame predicted voxel grids as .npy")
    p.add_argument("--flops", action="store_true",
                   help="print an XLA cost-analysis FLOPs/params table "
                        "(the reference's fvcore table, ref test.py:84)")
    p.add_argument("--coordinator", default=None,
                   help="host:port for jax.distributed.initialize "
                        "(multi-host eval; each process evaluates its index "
                        "shard, metric states are summed across processes)")
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
    import jax.numpy as jnp
    import numpy as np

    from stereoscene_tpu.config import Config
    from stereoscene_tpu.data import (
        BatchLoader,
        PipelineConfig,
        SemanticKittiIndex,
        SemanticKittiPipeline,
        inv_map,
    )
    from stereoscene_tpu.engine.eval import make_eval_step
    from stereoscene_tpu.engine.loop import run_evaluation
    from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        from stereoscene_tpu.config import merge_from_options

        merge_from_options(cfg, args.cfg_options)
    det_cfg = DetectorConfig.from_config(cfg)
    model = BEVDepthOccupancy(cfg=det_cfg)

    data_cfg = cfg["data"]["val" if args.split == "val" else "test"]
    pipe_cfg = PipelineConfig(
        input_size=tuple(cfg["data_config"]["input_size"]),
        is_train=False,
        point_cloud_range=tuple(cfg["point_cloud_range"]),
    )
    index = SemanticKittiIndex(
        data_root=data_cfg["data_root"],
        ann_file=data_cfg["ann_file"],
        split=args.split,
    )
    if len(index) == 0:
        raise SystemExit(f"no frames for split {args.split}")
    proc_frames = index.shard(jax.process_index(), jax.process_count())
    loader = BatchLoader(
        proc_frames, SemanticKittiPipeline(pipe_cfg),
        batch_size=args.batch_size, shuffle=False, drop_last=False,
        num_workers=4,
    )

    # init / restore parameters
    example = next(iter(loader))
    example_one = jax.tree.map(lambda x: x[:1], example)
    variables = jax.jit(lambda k: model.init(k, example_one, train=False))(
        jax.random.PRNGKey(0)
    )
    if args.checkpoint:
        from stereoscene_tpu.engine.checkpoint import CheckpointManager
        from stereoscene_tpu.engine.train import create_train_state

        state = create_train_state(model, variables)
        mgr = CheckpointManager(args.checkpoint)
        state, step = mgr.restore(state)
        print(f"restored checkpoint step {step}")
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

    eval_step = make_eval_step(model, tuple(cfg["occ_size"]))

    # static splat plans: eval runs aug-free with identity BDA, so the
    # frustum->voxel sort is constant per calibration and computed once on
    # the host (ops/splat_plan.py)
    from stereoscene_tpu.ops.splat_plan import SplatPlanCache

    loader = SplatPlanCache(model, int(np.prod(det_cfg.grid_shape))).wrap(
        loader
    )

    if args.flops:
        from stereoscene_tpu.engine import flops as flops_report
        from stereoscene_tpu.metrics import empty_state

        flops_report.report(
            lambda v, b: eval_step(v, b, empty_state())[0],
            variables["params"], variables, example,
            name="eval forward (incl. upsample+argmax)",
        )

    if args.submission_dir or args.save_pred_dir:
        from stereoscene_tpu.engine.loop import pad_batch
        from stereoscene_tpu.metrics import empty_state

        lut = inv_map()
        jitted = jax.jit(lambda v, b: eval_step(v, b, empty_state())[0])
        for i, batch in enumerate(loader):
            n_real = next(iter(batch.values())).shape[0]
            batch = pad_batch(batch, args.batch_size)
            preds = np.asarray(jitted(variables, batch))[:n_real]
            for j in range(preds.shape[0]):
                frame = proc_frames[i * args.batch_size + j]
                if args.save_pred_dir:
                    os.makedirs(args.save_pred_dir, exist_ok=True)
                    np.save(
                        os.path.join(
                            args.save_pred_dir,
                            f"{frame.sequence}_{frame.frame_id}.npy",
                        ),
                        preds[j].astype(np.uint8),
                    )
                if args.submission_dir:
                    out_dir = os.path.join(
                        args.submission_dir, "sequences", frame.sequence,
                        "predictions",
                    )
                    os.makedirs(out_dir, exist_ok=True)
                    raw = lut[preds[j].reshape(-1)].astype(np.uint16)
                    raw.tofile(
                        os.path.join(out_dir, frame.frame_id + ".label")
                    )
        print("wrote predictions")
        return

    results = run_evaluation(model, variables, eval_step, loader)
    print("\nSemanticKITTI SSC Evaluation")
    for k, v in results.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
