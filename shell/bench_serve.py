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

    # concurrent 1-query clients: serialized on the service lock vs
    # coalesced by the MicroBatcher into fused dispatches
    import threading

    from laff_tpu.engine.service import MicroBatcher

    svc = RetrievalService(ckpt, root, "gallery", gallery_dtype="bf16")
    svc.search(queries[:64], k=args.k)  # warm every bucket the burst hits
    svc.search(queries[:1], k=args.k)
    for n_clients in (8, 32):
        for mode in ("direct", "batched"):
            mb = MicroBatcher(svc, window_ms=3.0) if mode == "batched" else None
            target = mb.search if mb else svc.search

            def burst():
                lat = [None] * n_clients

                def one(i):
                    t0 = time.perf_counter()
                    target([queries[i % len(queries)]], k=args.k)
                    lat[i] = time.perf_counter() - t0

                ts = [threading.Thread(target=one, args=(i,))
                      for i in range(n_clients)]
                t0 = time.perf_counter()
                for t in ts:
                    t.start()
                for t in ts:
                    t.join()
                return time.perf_counter() - t0, lat

            burst()  # warm the batched bucket
            walls, lats = [], []
            for _ in range(max(3, args.iters // 2)):
                w, lat = burst()
                walls.append(w)
                lats.extend(lat)
            lats.sort()
            print(json.dumps({
                "concurrency": n_clients, "mode": mode,
                "burst_wall_ms": round(min(walls) * 1e3, 2),
                "qps": round(n_clients / min(walls), 1),
                "p50_ms": round(lats[len(lats) // 2] * 1e3, 2),
                "p99_ms": round(lats[int(len(lats) * 0.99)] * 1e3, 2),
                "fused_dispatches": mb.dispatches if mb else n_clients,
            }), flush=True)
            if mb:
                mb.close()


if __name__ == "__main__":
    main()
