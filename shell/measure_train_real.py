#!/usr/bin/env python3
"""MEASURED (not extrapolated) 80-epoch training headline.

VERDICT r4 item 3: BENCH_TRAIN_r04's hours were composed from a measured
cached step x steps_per_epoch x 80 + a measured val pass; nothing had
ever trained 80 epochs with the clock running. This driver does exactly
that: build the MSR-VTT-scale rehearsal world (130,260 train captions /
10,020 videos at the real feature dims, 9,940 val captions / 497 videos
— shell/make_rehearsal_world.py --scale msrvtt), then run the REAL
``trainer.main`` (config ``rehearsal`` == the flagship LAFF-ml shape,
bf16) for the reference's 80-epoch budget at the reference's batch 64
(do_laffml_mvtest3k.sh + retrieval_task.sh) with early stopping disabled
so all 80 epochs execute, and record the wall clock.

steps_per_dispatch is pinned to 64: the device tunnel used for these
benches adds ~32.5 ms per dispatch (a tunnel artifact, not a TPU cost —
see .claude/skills/verify), which at the auto default of 8 would bill
~40% dispatch latency against a measurement meant to capture chip-time;
64 steps/dispatch brings that under 2% while remaining a plain
production knob (--steps_per_dispatch).

Merges ``measured_*`` fields into BENCH_TRAIN_r{N}.json next to the
extrapolation so the two can be compared line by line.

Usage: python shell/measure_train_real.py [--root /tmp/rehearsal_msrvtt]
           [--epochs 80] [--batch_size 64]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/rehearsal_msrvtt")
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--steps_per_dispatch", type=int, default=64)
    args = ap.parse_args()

    t_world = time.perf_counter()
    if not os.path.isdir(os.path.join(args.root, "rtrain")):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "shell",
                                          "make_rehearsal_world.py"),
             args.root, "--scale", "msrvtt"],
            check=True,
        )
    world_s = time.perf_counter() - t_world

    from laff_tpu.engine import Options
    from laff_tpu.engine.trainer import main as trainer_main
    from laff_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()

    # Warm the device tunnel OUTSIDE the measured window: the first
    # executable launched through the axon tunnel in a process pays a
    # one-time stall that has measured anywhere from 0.7 s to 1469 s
    # depending on backend load (shell/diag_val_compile.py r05: AOT-compiled
    # txt tower first_exec 1469 s, the very next fresh program 0.69 s).
    # That is a tunnel/backend artifact, not a TPU or framework cost, and
    # it does not exist on directly-attached hardware; it is recorded
    # separately so nothing is hidden.
    import jax
    import jax.numpy as jnp

    t_warm = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda x: x @ x)(jnp.ones((8, 8))))
    warmup_s = time.perf_counter() - t_warm
    opt = Options(
        trainCollection="rtrain", valCollection="rval", rootpath=args.root,
        val_set="no", config_name="rehearsal", num_epochs=args.epochs,
        batch_size=args.batch_size, model_prefix="measured_headline",
        metric="mir", overwrite=1, workers=2,
        steps_per_dispatch=args.steps_per_dispatch,
        early_stop_patience=10_000,  # measure ALL epochs, no early stop
    )
    t0 = time.perf_counter()
    result = trainer_main(opt)
    wall = time.perf_counter() - t0

    ver = os.environ.get("LAFF_TPU_BENCH_ROUND", "r05")
    path = os.path.join(ROOT, f"BENCH_TRAIN_{ver}.json")
    out = {}
    if os.path.exists(path):
        with open(path) as fh:
            out = json.load(fh)
    hist = result.get("history") or []
    epoch_walls = [e["wall_seconds"] for e in hist if "wall_seconds" in e]
    steady = sorted(epoch_walls[1:]) if len(epoch_walls) > 1 else []
    measured = {
        "measured_hours": round(wall / 3600.0, 4),
        "measured_wall_seconds": round(wall, 1),
        "measured_epochs": result.get("epochs", args.epochs),
        "measured_best_perf": round(float(result["best_perf"]), 4),
        "measured_tunnel_warmup_seconds": round(warmup_s, 1),
        "measured_prepare_seconds": result.get("prepare_seconds"),
        "measured_first_epoch_seconds":
            round(epoch_walls[0], 1) if epoch_walls else None,
        "measured_median_epoch_seconds":
            round(steady[len(steady) // 2], 1) if steady else None,
        "measured_batch_size": args.batch_size,
        "measured_steps_per_dispatch": args.steps_per_dispatch,
        "measured_world_build_seconds": round(world_s, 1),
        "measured_note": (
            "one REAL trainer.main run on the MSR-VTT-scale rehearsal "
            "world (130,260 train captions, flagship bf16 LAFF-ml, "
            "batch 64, early stop disabled); wall excludes the one-time "
            "synthetic world build and the once-per-process tunnel warmup "
            "(recorded separately), includes prepare/vocab/caches/"
            "compiles/val passes"),
    }
    extrap = out.get("extrapolated_hours_80_epochs")
    if extrap and result.get("epochs", args.epochs) == 80:
        measured["measured_vs_extrapolated"] = round(
            measured["measured_hours"] / extrap, 3)
    out.update(measured)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(measured))


if __name__ == "__main__":
    main()
