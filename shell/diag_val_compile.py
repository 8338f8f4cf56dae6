#!/usr/bin/env python3
"""Break down the one-time validation-pass setup cost (VERDICT r4 item 2:
485 s = 32% of the training headline) into its actual components on the
real chip: per-program trace+compile wall, first-execute wall, featurize
+stage wall — then test whether compiling the programs in PARALLEL
threads through the remote-compile helper overlaps (the tunnel serializes
dispatches, but compilation is host/service work and may not serialize).

Writes one JSON line per phase so a wedge mid-way still leaves data.

Usage: python shell/diag_val_compile.py [--parallel]
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MSRVTT_VAL_VIDEOS = 497
MSRVTT_VAL_CAPS = 9_940


def log(name, seconds, **kw):
    print(json.dumps({"phase": name, "wall_s": round(seconds, 2), **kw}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parallel", action="store_true",
                    help="compile the tower/rank programs in threads")
    args = ap.parse_args()

    t_imp = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from laff_tpu.models import LAFFModel
    log("imports", time.perf_counter() - t_imp)

    spec = ge._flagship_spec()
    spec = dataclasses.replace(
        spec,
        txt=dataclasses.replace(spec.txt, compute_dtype="bfloat16"),
        vis=dataclasses.replace(spec.vis, compute_dtype="bfloat16"),
    )
    model = LAFFModel(spec)
    rng = np.random.default_rng(0)
    # init at a TINY batch: param shapes are batch-independent, and the
    # init program at b=1024 is itself a multi-minute compile over the
    # tunnel that would pollute the phase breakdown
    txt, vis = ge._example_batch(rng, b=8, spec=spec)

    t0 = time.perf_counter()
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis
    )
    log("model_init", time.perf_counter() - t0)

    from laff_tpu.data import host_cast_bf16
    from laff_tpu.engine.evaluator import _appliers, _flat_block_ranks

    txt_fn, vis_fn = _appliers(model)
    txt_b = host_cast_bf16(ge._example_batch(rng, b=1024, spec=spec)[0])
    vis_b = host_cast_bf16(
        ge._example_batch(rng, b=512, spec=spec)[1])

    # ---- AOT lower/compile each program, timed separately ---------------
    def lower_compile(tag, fn, *aot_args, **aot_kw):
        t0 = time.perf_counter()
        lowered = fn.lower(*aot_args, **aot_kw)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_comp = time.perf_counter() - t0
        log(f"compile:{tag}", t_lower + t_comp, lower_s=round(t_lower, 2),
            backend_compile_s=round(t_comp, 2))
        return compiled

    # embedding dims for the rank program: run the txt tower shape math
    # host-side via eval_shape (no device work)
    emb_shape = jax.eval_shape(
        lambda v, b: model.apply(v, b, method=model.encode_txt),
        variables, txt_b)
    heads = emb_shape.shape[1] if len(emb_shape.shape) == 3 else 1
    hd = int(np.prod(emb_shape.shape[1:]))
    tn_spec = jax.ShapeDtypeStruct((8192, hd), emb_shape.dtype)
    tn_spec2 = jax.ShapeDtypeStruct((MSRVTT_VAL_CAPS - 8192, hd),
                                    emb_shape.dtype)
    vn_spec = jax.ShapeDtypeStruct((MSRVTT_VAL_VIDEOS, hd), emb_shape.dtype)
    gt_spec = jax.ShapeDtypeStruct((8192,), jnp.int32)
    gt_spec2 = jax.ShapeDtypeStruct((MSRVTT_VAL_CAPS - 8192,), jnp.int32)

    jobs = [
        ("txt_tower", txt_fn, (variables, txt_b), {}),
        ("vis_tower", vis_fn, (variables, vis_b), {}),
        ("rank_blk_8192", _flat_block_ranks,
         (tn_spec, vn_spec, gt_spec), {"heads": heads}),
        ("rank_blk_rem", _flat_block_ranks,
         (tn_spec2, vn_spec, gt_spec2), {"heads": heads}),
    ]

    t_all = time.perf_counter()
    if args.parallel:
        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            futs = [ex.submit(lower_compile, tag, fn, *a, **kw)
                    for tag, fn, a, kw in jobs]
            compiled = [f.result() for f in futs]
    else:
        compiled = [lower_compile(tag, fn, *a, **kw)
                    for tag, fn, a, kw in jobs]
    log("compile_total", time.perf_counter() - t_all,
        parallel=args.parallel)

    # ---- first execution (device warmup, separate from compile) ---------
    t0 = time.perf_counter()
    e_txt = compiled[0](variables, txt_b)
    np.asarray(jax.tree_util.tree_leaves(e_txt)[0])
    log("first_exec:txt", time.perf_counter() - t0)
    t0 = time.perf_counter()
    e_vis = compiled[1](variables, vis_b)
    np.asarray(jax.tree_util.tree_leaves(e_vis)[0])
    log("first_exec:vis", time.perf_counter() - t0)


if __name__ == "__main__":
    main()
