#!/usr/bin/env python3
"""Batched multi-seed sweep benchmark (engine/sweep.py) at flagship dims.

Measures the device-resident cached+scan train path (the production
default) for S seeds fused in one vmapped program vs the S=1 baseline.
The single-seed step is optimizer-traffic/latency bound on a v5e (the
LAFF towers are small), so fusing S seeds should cost far less than S×
one seed — that ratio is the sweep engine's win over the reference's
one-job-per-GPU PID queue (retrieval_task.sh:17-45).

Usage: python shell/bench_seed_sweep.py [batch] [--seeds 1,2,4,8] [--k 8]
Prints one JSON line. Run standalone on the chip (one process at a time).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("LAFF_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["LAFF_TPU_PLATFORM"])

PEAK_BF16 = 197e12  # TPU v5e
PEAK_F32 = PEAK_BF16 / 2


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from bench_train_mfu import step_flops
    from laff_tpu.engine.sweep import make_multi_sweep_step, make_sweep_step
    from laff_tpu.engine.trainer import (
        TrainState, make_cached_train_step, make_train_step,
        make_txt_cached_train_step,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 128
    seed_counts = [1, 2, 4, 8]
    if "--seeds" in sys.argv:
        seed_counts = [int(x) for x in
                       sys.argv[sys.argv.index("--seeds") + 1].split(",")]
    K = int(sys.argv[sys.argv.index("--k") + 1]) if "--k" in sys.argv else 8
    max_len = 20

    spec = ge._flagship_spec()
    if "--bf16" in sys.argv:
        import dataclasses

        spec = dataclasses.replace(
            spec,
            txt=dataclasses.replace(spec.txt, compute_dtype="bfloat16"),
            vis=dataclasses.replace(spec.vis, compute_dtype="bfloat16"),
        )
    model_rng = np.random.default_rng(0)
    from laff_tpu.models import LAFFModel

    model = LAFFModel(spec)
    txt, vis = ge._example_batch(model_rng, b=batch, spec=spec, max_len=max_len)
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(2.0), optax.adam(learning_rate, eps=1e-4)
        )
    )(learning_rate=1e-4)

    txt_d = {k: jnp.asarray(v) for k, v in txt.items()}
    vis_d = {k: jnp.asarray(v) for k, v in vis.items()}

    def _mk_state(key_p, key_d):
        variables = model.init({"params": key_p, "dropout": key_d},
                               txt_d, vis_d)
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            schedule=variables.get("schedule", {}),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    def stacked_states(S):
        # vmapped init: the (S, ...) state materializes once, directly —
        # a device-side stack of per-seed states would transiently hold
        # 2x the state HBM (~1 GB/seed with adam moments) and OOM at S=8
        kp = jax.random.split(jax.random.key(11), S)
        kd = jax.random.split(jax.random.key(13), S)
        return jax.jit(jax.vmap(_mk_state))(kp, kd)

    # shared HBM caches at msrvtt10ktrain scale (bow sparse, like prod)
    n_videos, n_caps = 10_000, 130_000

    def grow(a, n):
        return jnp.asarray(
            np.repeat(np.asarray(a), max(1, -(-n // a.shape[0])), axis=0)[:n])

    vis_cache = {k: grow(v, n_videos) for k, v in vis.items()}
    txt_src = dict(txt)
    if "bow" in txt_src:
        bow_dim = txt_src.pop("bow").shape[1]
        irng0 = np.random.default_rng(7)
        txt_src["bow_ids"] = irng0.integers(
            0, bow_dim, (batch, max_len)).astype(np.int32)
        txt_src["bow_cnt"] = np.ones((batch, max_len), np.float32)
    txt_cache = {k: grow(np.asarray(v), n_caps) for k, v in txt_src.items()}

    train_step = make_train_step(model, tx, spec)
    step_c = make_cached_train_step(train_step, vis_cache)
    step_c = make_txt_cached_train_step(step_c, txt_cache)

    flops = step_flops(spec, batch, max_len)
    peak = PEAK_BF16 if spec.txt.compute_dtype == "bfloat16" else PEAK_F32
    irng = np.random.default_rng(1)
    key = jax.random.key(3)
    results = []
    base_per_step = None
    for S in seed_counts:
        try:
            sweep_step = make_sweep_step(step_c)
            multi = make_multi_sweep_step(sweep_step)
            stacked = stacked_states(S)
            active = jnp.ones((S,), bool)

            def stacks(i):
                ti = jnp.asarray(irng.integers(
                    0, n_caps, (K, S, batch)).astype(np.int32))
                vi = jnp.asarray(irng.integers(
                    0, n_videos, (K, S, batch)).astype(np.int32))
                rngs = jax.random.split(jax.random.fold_in(key, i), K)
                return ti, vi, rngs

            ti, vi, rngs = stacks(0)
            stacked, losses = multi(stacked, ti, vi, rngs, active)  # compile
            float(np.asarray(losses)[-1, -1])
            times = []
            for i in range(1, 6):
                ti, vi, rngs = stacks(i)
                t0 = time.perf_counter()
                stacked, losses = multi(stacked, ti, vi, rngs, active)
                float(np.asarray(losses)[-1, -1])
                times.append(time.perf_counter() - t0)
            wall = min(times)
        except Exception as e:  # noqa: BLE001
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            results.append({"seeds": S, "oom": True})
            print(json.dumps(results[-1]), file=sys.stderr, flush=True)
            break
        per_step = wall / K  # one step for ALL S seeds
        if S == seed_counts[0] and seed_counts[0] == 1:
            base_per_step = per_step
        results.append({
            "seeds": S,
            "wall_ms_per_step": round(per_step * 1e3, 2),
            "seed_steps_per_sec": round(S / per_step, 1),
            "mfu": round(S * flops / per_step / peak, 4),
            "cost_vs_single": (round(per_step / base_per_step, 2)
                               if base_per_step else None),
            "speedup_vs_sequential": (round(S * base_per_step / per_step, 2)
                                      if base_per_step else None),
        })
        print(json.dumps(results[-1]), file=sys.stderr, flush=True)
        del stacked

    print(json.dumps({
        "metric": "fused_seed_sweep_train",
        "batch": batch,
        "k_steps_per_dispatch": K,
        "flops_per_seed_step": round(flops / 1e9, 2),
        "compute_dtype": spec.txt.compute_dtype,
        "results": results,
    }))


if __name__ == "__main__":
    main()
