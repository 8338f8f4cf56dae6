#!/usr/bin/env python3
"""Sweep driver CLI (replaces ``shell/retrieval_task.sh``): train + predict
over seeds x parm_adjust_configs.

Example (LAFF on MSR-VTT, reference shell/do_laff_mvtest3k.sh):
  python shell/retrieval_task.py \
      --trainCollection msrvtt10ktrain --valCollection msrvtt10kval \
      --testCollection msrvtt10ktest --config laff \
      --parm_adjust_configs 0_12_0_12_0_0_1 --random_seeds 2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("LAFF_TPU_PLATFORM"):
    # honored escape hatch: TPU plugins can override the JAX_PLATFORMS env
    # var, so force the platform through jax.config before backend init
    import jax

    jax.config.update("jax_platforms", os.environ["LAFF_TPU_PLATFORM"])

from laff_tpu.engine.orchestrate import SweepOptions, avs_task, retrieval_task
from laff_tpu.utils import ROOT_PATH


def main(argv=None):
    parser = argparse.ArgumentParser("LAFF-TPU sweep driver")
    parser.add_argument("--rootpath", default=ROOT_PATH)
    parser.add_argument("--trainCollection", required=True)
    parser.add_argument("--valCollection", required=True)
    parser.add_argument("--testCollection", required=True)
    parser.add_argument("--val_set", default="no")
    parser.add_argument("--config", required=True)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--num_epochs", type=int, default=80)
    parser.add_argument("--overwrite", type=int, default=0)
    parser.add_argument("--random_seeds", default="2",
                        help="space- or comma-separated")
    parser.add_argument("--parm_adjust_configs", default="None",
                        help="space- or comma-separated sweep strings")
    parser.add_argument("--model_prefix_", default="runs_")
    parser.add_argument("--result_file", default="result_log/result_test.txt")
    parser.add_argument("--trainCollection2", default="None")
    parser.add_argument("--save_mean_last", type=int, default=0)
    parser.add_argument("--pretrained_file_path", default="None")
    parser.add_argument("--task3_caption", default="no_task3_caption")
    parser.add_argument("--avs_query_sets", default=None,
                        help="e.g. tv16.avs.txt,tv17.avs.txt (enables AVS mode)")
    parser.add_argument("--avs_editions", default=None,
                        help="e.g. tv16,tv17")
    parser.add_argument("--jobs", type=int, default=1,
                        help="run up to N (seed x parm) combos as parallel "
                             "subprocesses (reference retrieval_task.sh's "
                             "PID queue over devices, sh:17-45). Use only "
                             "when each job has its own accelerator or runs "
                             "on CPU — jobs on one chip contend for HBM")
    parser.add_argument("--batch_seeds", type=int, default=0,
                        help="train all seeds of each parm config in ONE "
                             "fused vmapped program on the chip "
                             "(engine/sweep.py) — the TPU-native answer "
                             "to the reference's multi-GPU PID queue. "
                             "Mutually exclusive with --jobs > 1.")
    args = parser.parse_args(argv)
    if args.batch_seeds and args.jobs > 1:
        parser.error("--batch_seeds fuses seeds on one chip; --jobs "
                     "spreads them over processes — pick one")

    def split(s):
        return [x for x in s.replace(",", " ").split() if x]

    seeds = split(args.random_seeds)
    parms = split(args.parm_adjust_configs)
    if args.jobs > 1 and len(seeds) * len(parms) > 1:
        # job pool: re-exec one (seed, parm) combo per subprocess
        import subprocess
        from concurrent.futures import ThreadPoolExecutor

        base = [sys.executable, os.path.abspath(__file__)]
        for a in argv if argv is not None else sys.argv[1:]:
            base.append(a)

        def strip_opt(cmd, name):
            out, skip = [], False
            for x in cmd:
                if skip:
                    skip = False
                    continue
                if x == name:
                    skip = True
                    continue
                out.append(x)
            return out

        base = strip_opt(strip_opt(strip_opt(
            base, "--jobs"), "--random_seeds"), "--parm_adjust_configs")

        def run_one(combo):
            seed, parm = combo
            cmd = base + ["--jobs", "1", "--random_seeds", seed,
                          "--parm_adjust_configs", parm]
            return subprocess.run(cmd).returncode

        combos = [(s, p) for s in seeds for p in parms]
        with ThreadPoolExecutor(max_workers=args.jobs) as pool:
            rcs = list(pool.map(run_one, combos))
        return max(rcs) if rcs else 0

    sweep = SweepOptions(
        trainCollection=args.trainCollection,
        valCollection=args.valCollection,
        testCollection=args.testCollection,
        rootpath=os.path.expanduser(args.rootpath),
        config_name=args.config,
        parm_adjust_configs=split(args.parm_adjust_configs),
        random_seeds=[int(s) for s in split(args.random_seeds)],
        val_set=args.val_set,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        overwrite=args.overwrite,
        model_prefix_base=args.model_prefix_,
        result_file=args.result_file,
        trainCollection2=args.trainCollection2,
        save_mean_last=args.save_mean_last,
        pretrained_file_path=args.pretrained_file_path,
        task3_caption=args.task3_caption,
        avs_query_sets=args.avs_query_sets,
        avs_editions=split(args.avs_editions) if args.avs_editions else None,
        batch_seeds=bool(args.batch_seeds),
    )
    if sweep.avs_query_sets:
        avs_task(sweep)
    else:
        retrieval_task(sweep)
    return 0


if __name__ == "__main__":
    sys.exit(main())
