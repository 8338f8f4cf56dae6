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
    """Per-epoch validation wall at MSR-VTT val scale through the
    PRODUCTION path (``evaluator.validate`` + ``Embedder``): embed 9,940
    captions + 497 videos through the flagship bf16 towers, rank on
    device. Returns (staged_steady, unstaged, first_epoch_extra):
    production trainer feeds set ``stage_on_device`` so every epoch
    after the first replays the featurized batches from HBM (staged);
    ``unstaged`` is the pre-staging cost (re-upload every epoch) kept
    for comparison."""
    import dataclasses

    import jax
    import numpy as np

    import __graft_entry__ as ge
    from laff_tpu.data import EvalFeed
    from laff_tpu.engine.evaluator import Embedder, validate
    from laff_tpu.models import LAFFModel

    spec = ge._flagship_spec()
    # headline FrameLAFF config trains with float16/AMP -> bf16 here,
    # matching the --bf16 step rows
    spec = dataclasses.replace(
        spec,
        txt=dataclasses.replace(spec.txt, compute_dtype="bfloat16"),
        vis=dataclasses.replace(spec.vis, compute_dtype="bfloat16"),
    )
    model = LAFFModel(spec)
    rng = np.random.default_rng(0)
    txt, vis = ge._example_batch(rng, b=1024, spec=spec)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis
    )
    eval_vars = {k: variables[k] for k in variables}

    # Pregenerate all val features host-side BEFORE timing: production
    # val features stream from memmapped BigFiles (microseconds per
    # batch); synthesizing ~100 MB of random features per chunk on the
    # host is a bench-harness artifact that once inflated this number 10x.
    txt_ids = [f"v{i % MSRVTT_VAL_VIDEOS}#0" for i in range(MSRVTT_VAL_CAPS)]
    vis_ids = [f"v{i}" for i in range(MSRVTT_VAL_VIDEOS)]
    txt_all, _ = ge._example_batch(
        np.random.default_rng(1), b=MSRVTT_VAL_CAPS, spec=spec)
    _, vis_all = ge._example_batch(
        np.random.default_rng(2), b=MSRVTT_VAL_VIDEOS, spec=spec)
    t_index = {tid: i for i, tid in enumerate(txt_ids)}
    v_index = {vid: i for i, vid in enumerate(vis_ids)}

    def txt_batcher(ids):
        rows = np.asarray([t_index[i] for i in ids])
        return {k: v[rows] for k, v in txt_all.items()}

    def vis_batcher(ids):
        rows = np.asarray([v_index[i] for i in ids])
        return {k: v[rows] for k, v in vis_all.items()}

    def feeds(staged):
        tf = EvalFeed(txt_ids, txt_batcher, batch_size=1024)
        vf = EvalFeed(vis_ids, vis_batcher, batch_size=512)
        tf.stage_on_device = vf.stage_on_device = staged
        return tf, vf

    embedder = Embedder(model, eval_vars)

    def one_pass(tf, vf):
        m = validate(embedder, tf, vf)
        assert np.asarray(m["ranks"]).shape == (MSRVTT_VAL_CAPS,)

    # pass 1 warms the WHOLE pipeline (tower jits + counting-rank
    # program) and stages the feeds; per-epoch val cost is the
    # steady-state replay. Epoch 1 additionally pays the compiles once
    # per run, reported separately.
    tf, vf = feeds(staged=True)
    t0 = time.perf_counter()
    one_pass(tf, vf)
    compile_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    one_pass(tf, vf)
    staged_wall = time.perf_counter() - t0

    # the pre-staging production cost: featurize + upload every epoch
    tfu, vfu = feeds(staged=False)
    t0 = time.perf_counter()
    one_pass(tfu, vfu)
    unstaged_wall = time.perf_counter() - t0
    return staged_wall, unstaged_wall, compile_wall


def main():
    out = {"metric": "flagship_train_headline", "unit": "hours_full_train"}
    ver = os.environ.get("LAFF_TPU_BENCH_ROUND", "r04")
    path = os.path.join(ROOT, f"BENCH_TRAIN_{ver}.json")

    if "--val_only" in sys.argv and os.path.exists(path):
        # re-measure only the validation pass (e.g. after an evaluator
        # change); the step rows are per-batch subprocess measurements
        # unaffected by it. The artifact notes the reuse.
        with open(path) as fh:
            prev = json.load(fh)
        rows = {int(k): v for k, v in prev["step_by_batch"].items()}
        # provenance chain: the rows came from whatever round actually
        # measured them ('captured'), possibly through earlier --val_only
        # hops ('step_rows_reused_from'); never stamp the current round.
        out["step_rows_reused_from"] = prev.get(
            "step_rows_reused_from", prev.get("captured", "unknown"))
    else:
        out["captured"] = ver
        # reference regime (batch 64) + production default (128) +
        # headroom rows
        rows = {}
        for batch in (64, 128, 512, 2048):
            try:
                r = run_step_bench(batch)
            except Exception as e:  # noqa: BLE001 — record, keep artifact
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

    val_wall, val_unstaged, val_compile = measure_val_pass()
    out["val_pass_seconds"] = round(val_wall, 2)
    out["val_pass_unstaged_seconds"] = round(val_unstaged, 2)
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

    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
