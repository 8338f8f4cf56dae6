#!/usr/bin/env python3
"""Serving-path latency bench: RetrievalService at a configurable gallery
scale on the current backend.

Builds a synthetic collection + a tiny trained checkpoint (one-off), then
measures warm search latency per query-bucket size for bf16 and int8
galleries. The score+top-k work at production dims is covered by
shell/bench_int8_topk.py / bench_large_gallery.py; this measures the
END-TO-END service path (text featurization -> tower -> score -> top-k ->
host) including the dispatch overhead a live endpoint pays.

Prints one JSON line per (dtype, batch) point.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if os.environ.get("LAFF_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["LAFF_TPU_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=2000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from helpers import WORDS, build_collection, build_w2v

    from laff_tpu.engine import Options
    from laff_tpu.engine.service import RetrievalService
    from laff_tpu.engine.trainer import main as train_main

    root = tempfile.mkdtemp(prefix="bench_serve_")
    build_collection(root, "toytrain", n_videos=64, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=16, caps_per_video=1, seed=5)
    build_collection(root, "gallery", n_videos=args.videos, caps_per_video=1,
                     seed=9)
    build_w2v(root)
    result = train_main(Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=args.epochs,
        batch_size=16, model_prefix="serve_bench",
    ))
    ckpt = os.path.join(result["model_path"], "model_best.pth.tar")

    queries = [f"the {' '.join(WORDS[i % 12 : i % 12 + 4])}" for i in range(512)]
    for dtype in ("bf16", "int8"):
        svc = RetrievalService(ckpt, root, "gallery", gallery_dtype=dtype)
        for batch in (1, 8, 64):
            qs = queries[:batch]
            svc.search(qs, k=args.k)  # compile
            svc.search(qs, k=args.k)  # settle
            times = []
            for i in range(args.iters):
                # rotate queries to defeat any host-side caching
                qs_i = queries[i % 8 : i % 8 + batch]
                t0 = time.perf_counter()
                svc.search(qs_i, k=args.k)
                times.append(time.perf_counter() - t0)
            times.sort()
            print(json.dumps({
                "dtype": dtype, "batch": batch, "gallery": args.videos,
                "p50_ms": round(times[len(times) // 2] * 1e3, 2),
                "min_ms": round(times[0] * 1e3, 2),
                "qps_p50": round(batch / times[len(times) // 2], 1),
            }), flush=True)


if __name__ == "__main__":
    main()
