#!/usr/bin/env python3
"""Training CLI — argument surface mirrors the reference ``do_trainer.py``
so the shell orchestration layer drives this framework unchanged."""

import argparse
import sys

from laff_tpu.engine import Options
from laff_tpu.utils import ROOT_PATH


def parse_args(argv=None):
    parser = argparse.ArgumentParser("LAFF-TPU training script.")
    parser.add_argument("trainCollection", type=str, help="train collection")
    parser.add_argument("valCollection", type=str, help="validation collection")
    parser.add_argument("--rootpath", type=str, default=ROOT_PATH)
    parser.add_argument("--trainCollection2", type=str, default="None")
    parser.add_argument("--task2_caption", type=str, default="no_task2_caption")
    parser.add_argument("--task2_intended", default=0, type=int, choices=[0, 1],
                        help="opt-in concept-space task2 loss (the reference's "
                             "task2 is dead code; 0 keeps effective parity)")
    parser.add_argument("--task3_caption", type=str, default="no_task3_caption")
    parser.add_argument("--train_strategy", type=str, default="usual")
    parser.add_argument("--overwrite", type=int, default=0, choices=[0, 1])
    parser.add_argument("--val_set", type=str, default="setA")
    parser.add_argument("--metric", type=str, default="mir",
                        choices=["r1", "r5", "r10", "medr", "meanr", "mir"])
    parser.add_argument("--num_epochs", default=80, type=int)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--workers", default=2, type=int,
                        help="feed prefetch depth (batches kept in flight)")
    parser.add_argument("--model_prefix", default="runs_0", type=str)
    parser.add_argument("--config_name", type=str, default="laff")
    parser.add_argument("--parm_adjust_config", type=str, default="None")
    parser.add_argument("--device", default="0", type=str,
                        help="accepted for CLI parity; device selection is JAX-managed")
    parser.add_argument("--random_seed", default=2, type=int)
    parser.add_argument("--local_rank", default=0, type=int)
    parser.add_argument("--pretrained_file_path", default="None", type=str)
    parser.add_argument("--save_mean_last", default=0, type=int, choices=[0, 1])
    parser.add_argument("--steps_per_dispatch", default=-1, type=int,
                        help="K train steps per device dispatch (lax.scan); "
                             "-1 auto (scan once epochs are device-resident)")
    parser.add_argument("--device_feature_cache", default=-1, type=int,
                        choices=[-1, 0, 1],
                        help="keep train video features in HBM; batches "
                             "carry row indices only (-1 auto)")
    parser.add_argument("--device_text_cache", default=-1, type=int,
                        choices=[-1, 0, 1],
                        help="keep caption encodings in HBM too; a train "
                             "step's host traffic becomes two (B,) int32 "
                             "index vectors (-1 auto)")
    parser.add_argument("--device_text_featurize", default=0, type=int,
                        choices=[0, 1],
                        help="ship bow as sparse (ids, counts); densify "
                             "on device")
    parser.add_argument("--stage_val_features", default=1, type=int,
                        choices=[0, 1],
                        help="stage the epoch-invariant validation feature "
                             "batches in HBM once and replay them every "
                             "epoch (bit-identical; budget-guarded)")
    parser.add_argument("--resume", default=0, type=int, choices=[0, 1],
                        help="resume a run (optimizer + LR state) from "
                             "model_resume.pth.tar")
    parser.add_argument("--data_parallel", default=0, type=int,
                        help="train data-parallel over an N-device mesh "
                             "(batch_size must divide by N)")
    args = parser.parse_args(argv)
    return Options(**vars(args))


def main(argv=None):
    import os

    opt = parse_args(argv)
    from laff_tpu.engine.prepare import model_dir_for
    from laff_tpu.utils import check_to_skip

    best = os.path.join(model_dir_for(opt), "model_best.pth.tar")
    if check_to_skip(best, opt.overwrite):
        return 0
    from laff_tpu.engine.prepare import load_config

    config = load_config(opt.config_name)
    if getattr(config, "model_name", "") == "End2EndClip":
        from laff_tpu.engine import end2end

        end2end.main(opt)  # raises on failure
        return 0
    from laff_tpu.engine import trainer

    mesh = None
    if opt.data_parallel > 0:
        import jax

        n = min(opt.data_parallel, len(jax.devices()))
        if n > 1:
            from laff_tpu.parallel import data_parallel_mesh

            mesh = data_parallel_mesh(n)
    # trainer.main returns a result dict for programmatic callers; the CLI
    # (and the laff-train console script, which sys.exit()s this return
    # value) must yield process status 0 on success.
    trainer.main(opt, mesh=mesh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
