#!/usr/bin/env python3
"""Retrieval serving endpoint (TPU-native extension; the reference is
batch-only).

Loads a checkpoint, embeds the collection's gallery into HBM once, and
serves ad-hoc text queries over stdlib HTTP:

  POST /search   {"queries": ["a dog runs", ...], "k": 10}
                 -> {"results": [[{"id": ..., "score": ...}, ...], ...]}
  POST /ingest   {"ids": [...], "features": {"clip_ft": [[...], ...], ...}}
                 -> {"count": N, "capacity": C}   (needs --capacity slots)
  GET  /healthz  -> {"ok": true, "gallery": N, "dtype": "bf16"}

Example:
  python do_server.py iacc.3 ~/ckpt/model_best.pth.tar --rootpath ~/VisualSearch \
      --port 8080 --gallery_dtype int8
"""

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from laff_tpu.utils import ROOT_PATH, get_logger

logger = get_logger("do_server")


def parse_args(argv=None):
    p = argparse.ArgumentParser("LAFF-TPU retrieval server")
    p.add_argument("collection", type=str, help="gallery collection")
    p.add_argument("model_path", type=str, help="checkpoint to serve")
    p.add_argument("--rootpath", type=str, default=ROOT_PATH)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--k_default", type=int, default=10)
    p.add_argument("--gallery_dtype", type=str, default="bf16",
                   choices=["bf16", "int8"],
                   help="int8 = half the HBM, ~1.6x MXU rate, quantized "
                        "scores (measured exact top-k order at scale)")
    p.add_argument("--capacity", type=int, default=0,
                   help="preallocate HBM slots for POST /ingest (0 = "
                        "gallery is read-only at its initial size)")
    p.add_argument("--batch_window_ms", type=float, default=2.0,
                   help="dynamic micro-batching: coalesce concurrent "
                        "/search requests arriving within this window "
                        "into one device dispatch (0 disables)")
    p.add_argument("--gallery_cache", type=str, default=None,
                   help="snapshot file (.npz) of the embedded gallery in "
                        "serving form — restarts restore it instantly "
                        "instead of re-running the vis tower")
    p.add_argument("--mesh_devices", type=int, default=0,
                   help="shard the gallery rows over an N-device mesh "
                        "(local top-k + k-row all_gather merge): N chips "
                        "serve an N-times larger gallery (2N x with "
                        "--gallery_dtype int8). 0 = single device")
    return p.parse_args(argv)


def make_handler(service, k_default: int):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "ok": True,
                    "gallery": len(service.vis_ids),
                    "dtype": service.gallery_dtype,
                    "heads": service.heads,
                })
            elif self.path == "/metrics":
                self._reply(200, service.metrics())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path == "/ingest":
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    ids = req.get("ids")
                    feats = req.get("features")
                    if (not isinstance(ids, list)
                            or not all(isinstance(i, str) for i in ids)
                            or not isinstance(feats, dict)):
                        self._reply(400, {"error": "'ids' must be a list of "
                                          "strings and 'features' a dict of "
                                          "name -> rows"})
                        return
                    import numpy as _np

                    try:
                        arrays = {k: _np.asarray(v, dtype=_np.float32)
                                  for k, v in feats.items()}
                    except (TypeError, ValueError) as e:
                        self._reply(400, {"error": f"bad feature rows: {e}"})
                        return
                    count = service.add_videos(ids, arrays)
                    self._reply(200, {"count": count,
                                      "capacity": service.capacity})
                except (ValueError, TypeError, IndexError, KeyError) as e:
                    # client input errors (shape/dup/capacity/unknown
                    # feature name) are 400s, not server faults
                    self._reply(400, {"error": str(e)})
                except Exception as e:
                    logger.exception("ingest failed")
                    self._reply(500, {"error": str(e)})
                return
            if self.path != "/search":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                queries = req.get("queries")
                if not isinstance(queries, list) or not all(
                    isinstance(q, str) for q in queries
                ):
                    self._reply(400, {"error": "'queries' must be a list of strings"})
                    return
                k = req.get("k", k_default)
                if not isinstance(k, int) or isinstance(k, bool) or not (
                    1 <= k <= 10000
                ):
                    self._reply(400, {"error": "'k' must be an int in [1, 10000]"})
                    return
                results = service.search(queries, k=k)
                self._reply(200, {"results": [
                    [{"id": vid, "score": score} for vid, score in row]
                    for row in results
                ]})
            except Exception as e:  # surface the error to the client
                logger.exception("search failed")
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *args):  # route through our logger
            logger.info("%s %s", self.address_string(), fmt % args)

    return Handler


class _Front:
    """Service facade routing search through the micro-batcher; everything
    else (ingest, metadata) delegates to the service directly."""

    def __init__(self, service, batcher):
        self._service = service
        self._batcher = batcher

    def search(self, queries, k=10):
        return self._batcher.search(queries, k=k)

    def metrics(self):
        m = self._service.metrics()
        m["batched_requests"] = self._batcher.requests
        m["fused_dispatches"] = self._batcher.dispatches
        return m

    def __getattr__(self, name):
        return getattr(self._service, name)


def main(argv=None):
    args = parse_args(argv)
    from laff_tpu.engine.service import RetrievalService

    mesh = None
    if args.mesh_devices > 1:
        from laff_tpu.parallel import data_parallel_mesh

        mesh = data_parallel_mesh(args.mesh_devices)
    service = RetrievalService(
        args.model_path, args.rootpath, args.collection,
        batch_size=args.batch_size, gallery_dtype=args.gallery_dtype,
        capacity=args.capacity or None,
        gallery_cache=args.gallery_cache,
        mesh=mesh,
    )
    front = service
    if args.batch_window_ms > 0:
        # concurrent ThreadingHTTPServer requests coalesce into single
        # device dispatches instead of serializing on the service lock
        from laff_tpu.engine.service import MicroBatcher

        front = _Front(service, MicroBatcher(
            service, window_ms=args.batch_window_ms))
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(front, args.k_default))
    logger.info("serving %s on http://%s:%d (POST /search)",
                args.collection, args.host, server.server_address[1])
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
