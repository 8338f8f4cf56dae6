#!/usr/bin/env python3
"""Training-throughput headline: BENCH_TRAIN_r04-style artifact.

Measures the production cached+scan train step at flagship dims (the
LAFF-ml headline architecture of ``__graft_entry__._flagship_spec``,
bf16 compute like the reference's AMP), plus the per-epoch validation
pass at MSR-VTT val scale, and extrapolates the full LAFF-ml @ MV-test3k
train against the reference baseline (~7 h on a 2080Ti,
/root/reference/shell/README.MD runtime table; the LAFF-ml script trains
msrvtt10ktrain at batch 64 for <=80 epochs with 10-epoch-patience early
stopping, shell/do_laffml_mvtest3k.sh + retrieval_task.sh).

The cached step is measured by subprocess-running bench_train_mfu.py
(--bf16 --cached K) per batch size, so a wedged compile can't take down
the whole artifact. The batch-scaling rows quantify the "attack the idle
step" headroom: the same chip absorbs multiplied batch at sublinear step
cost, so throughput is a batch-size knob, not a kernel gap.

Writes BENCH_TRAIN_r{N}.json at the repo root and prints it.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# MSR-VTT 10k split (reference do_laffml_mvtest3k.sh world)
MSRVTT_TRAIN_CAPS = 130_260
MSRVTT_VAL_VIDEOS = 497
MSRVTT_VAL_CAPS = 9_940
REF_HOURS = 7.0          # shell/README.MD LAFF-ml @ MV-test3k
REF_BATCH = 64           # do_laffml_mvtest3k.sh
MAX_EPOCHS = 80          # retrieval_task.sh


def run_step_bench(batch: int, cached_k: int = 32, timeout: int = 1200):
    cmd = [sys.executable, os.path.join(ROOT, "shell", "bench_train_mfu.py"),
           str(batch), "--bf16", "--cached", str(cached_k)]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"bench_train_mfu batch={batch} failed: "
                           f"{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def measure_val_pass():
    """Per-epoch validation wall at MSR-VTT val scale: embed 9,940
    captions + 497 videos through the flagship towers, rank on device."""
    import jax
    import numpy as np

    import __graft_entry__ as ge
    from laff_tpu.engine import evaluator as EV
    from laff_tpu.models import LAFFModel

    spec = ge._flagship_spec()
    model = LAFFModel(spec)
    rng = np.random.default_rng(0)
    txt, vis = ge._example_batch(rng, b=1024, spec=spec)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis
    )
    eval_vars = {k: variables[k] for k in variables}

    txt_fn = jax.jit(lambda v, b: model.apply(v, b, method=model.encode_txt))
    vis_fn = jax.jit(lambda v, b: model.apply(v, b, method=model.encode_vis))

    def txt_batch(b, seed):
        t, _ = ge._example_batch(np.random.default_rng(seed), b=b, spec=spec)
        return {k: np.asarray(v) for k, v in t.items()}

    def vis_batch(b):
        _, v = ge._example_batch(np.random.default_rng(2), b=b, spec=spec)
        return {k: np.asarray(vv) for k, vv in v.items()}

    # Stage all val batches host-side BEFORE timing: production val
    # features stream from memmapped BigFiles (microseconds per batch);
    # synthesizing ~100 MB of random features per chunk on the host is a
    # bench-harness artifact that once inflated this number 10x. Two
    # distinct sets (warmup + timed) so the dispatch stack cannot elide
    # repeats.
    import jax.numpy as jnp

    n_chunks = -(-MSRVTT_VAL_CAPS // 1024)
    txt_ids = [f"v{i % MSRVTT_VAL_VIDEOS}#0" for i in range(MSRVTT_VAL_CAPS)]
    vis_ids = [f"v{i}" for i in range(MSRVTT_VAL_VIDEOS)]

    def one_pass(batches, vis_b):
        txt_chunks = [txt_fn(eval_vars, b) for b in batches]
        vis_embs = vis_fn(eval_vars, vis_b)[:MSRVTT_VAL_VIDEOS]
        txt_embs = jnp.concatenate(txt_chunks, axis=0)[:MSRVTT_VAL_CAPS]
        ranks = np.asarray(EV.t2v_ranks(txt_embs, vis_embs, txt_ids, vis_ids))
        assert ranks.shape == (MSRVTT_VAL_CAPS,)

    warm = [txt_batch(1024, seed=100 + i) for i in range(n_chunks)]
    timed = [txt_batch(1024, seed=200 + i) for i in range(n_chunks)]
    vis_b = vis_batch(512)

    # warm up the WHOLE pipeline (tower jits + concat + counting-rank
    # program): the per-epoch val cost is the steady-state cost — epoch 1
    # additionally pays these compiles once per run, reported separately
    t0 = time.perf_counter()
    one_pass(warm, vis_b)
    compile_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    one_pass(timed, vis_b)
    return time.perf_counter() - t0, compile_wall


def main():
    out = {"metric": "flagship_train_headline", "unit": "hours_full_train"}

    # reference regime (batch 64) + production default (128) + headroom rows
    rows = {}
    for batch in (64, 128, 512, 2048):
        try:
            r = run_step_bench(batch)
        except Exception as e:  # noqa: BLE001 — record, keep the artifact
            rows[batch] = {"error": str(e)[-300:]}
            continue
        ms = r["cached_wall_ms_per_step"]
        rows[batch] = {
            "ms_per_step": ms,
            "steps_per_sec": r["cached_steps_per_sec_wall"],
            "captions_per_sec": round(batch * 1000.0 / ms, 1),
            "mfu_wall": r["cached_mfu_wall"],
        }
    out["step_by_batch"] = rows

    val_wall, val_compile = measure_val_pass()
    out["val_pass_seconds"] = round(val_wall, 2)
    out["val_first_epoch_extra_seconds"] = round(val_compile - val_wall, 2)

    ref_row = rows.get(REF_BATCH, {})
    if "ms_per_step" in ref_row:
        steps_per_epoch = -(-MSRVTT_TRAIN_CAPS // REF_BATCH)
        epoch_s = steps_per_epoch * ref_row["ms_per_step"] / 1e3 + val_wall
        # one-time first-epoch compile overhead counted once per run
        full80_h = (MAX_EPOCHS * epoch_s
                    + max(val_compile - val_wall, 0.0)) / 3600.0
        out.update({
            "steps_per_epoch": steps_per_epoch,
            "epoch_wall_seconds": round(epoch_s, 2),
            "extrapolated_hours_80_epochs": round(full80_h, 3),
            "ref_hours_2080ti": REF_HOURS,
            "speedup_vs_ref": round(REF_HOURS / full80_h, 1),
            "note": ("full 80-epoch MV-test3k LAFF-ml train extrapolated "
                     "from the measured cached step at the reference's "
                     "batch 64 + measured val pass; the reference's ~7 h "
                     "includes its early stop, so the speedup quoted "
                     "against our NO-early-stop 80-epoch bound is "
                     "conservative"),
        })
        out["value"] = out["extrapolated_hours_80_epochs"]
        out["vs_baseline"] = out["speedup_vs_ref"]

    ver = os.environ.get("LAFF_TPU_BENCH_ROUND", "r04")
    path = os.path.join(ROOT, f"BENCH_TRAIN_{ver}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
