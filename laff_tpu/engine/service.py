"""Online retrieval serving: checkpoint -> resident gallery -> live queries.

The reference is batch-only (``predictor.py`` writes ranking files); this
module is the TPU-native serving tier the deployment story needs: load a
checkpoint once, embed the whole gallery into HBM once (bf16 exact, or
int8 at 2x shots/chip via laff_tpu.ops.quantized), then answer ad-hoc
text queries at interactive latency — each query batch is one text-tower
pass plus one MXU score+top-k dispatch against the resident gallery.

Query batches bucket to powers of two so every arrival size reuses a
compiled executable (no data-dependent shapes ever reach jit).

``do_server.py`` wraps this in a stdlib HTTP endpoint; the class is the
in-process API.
"""

from __future__ import annotations

import os
import threading
import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import EvalFeed
from ..utils import get_logger
from .checkpoint import load_checkpoint
from .evaluator import Embedder
from .predictor import rebuild_featurizers, rebuild_model

logger = get_logger(__name__)


class MicroBatcher:
    """Coalesce concurrent ``search`` calls into single device dispatches.

    A threaded endpoint (``do_server.py`` uses ThreadingHTTPServer) would
    otherwise serialize concurrent requests on the service lock, each
    paying its own text-tower + score/top-k dispatch — through a tunneled
    runtime that is a fixed ~30 ms RTT *per request*. The batcher parks
    arriving requests on a queue; a dispatcher thread drains everything
    queued (up to ``max_queries``) after waiting ``window_ms`` for
    stragglers, runs ONE fused search for the union, and splits the
    ranked lists back per request. Per-request ``k`` is honored by
    executing at the max and truncating.

    Results are identical to per-request ``search`` calls: the union is
    concatenated in arrival order and sliced back by offset.
    """

    def __init__(self, service: "RetrievalService", window_ms: float = 2.0,
                 max_queries: int = 512):
        self._service = service
        self._window = window_ms / 1e3
        self._max = max_queries
        self._pending: List[tuple] = []  # (queries, k, event, slot)
        self._cv = threading.Condition()
        self._closed = False
        self.dispatches = 0  # fused device round trips (observability)
        self.requests = 0  # caller-side search() calls coalesced
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="laff-microbatch")
        self._thread.start()

    def search(self, queries: Sequence[str], k: int = 10):
        """Same contract as RetrievalService.search, batched across
        concurrent callers."""
        if not queries:
            return []
        if int(k) < 1:
            # validate per request — a bad k must not poison the batch
            raise ValueError(f"k must be >= 1, got {k}")
        slot: dict = {}
        done = threading.Event()
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._pending.append((list(queries), int(k), done, slot))
            self.requests += 1
            self._cv.notify()
        done.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._thread.join(timeout=5)

    def _run(self):
        while True:
            with self._cv:
                while not self._pending and not self._closed:
                    self._cv.wait()
                if self._closed and not self._pending:
                    return
            # brief straggler window: requests that arrive while the
            # previous dispatch is in flight batch up naturally; this only
            # pads the very front of an idle period
            time.sleep(self._window)
            with self._cv:
                batch, self._pending = (self._pending[: self._max],
                                        self._pending[self._max :])
            queries: List[str] = []
            for q, _k, _e, _s in batch:
                queries.extend(q)
            k_max = max(k for _q, k, _e, _s in batch)
            try:
                results = self._service.search(queries, k=k_max)
                self.dispatches += 1
                off = 0
                for q, k, event, slot in batch:
                    slot["result"] = [row[:k] for row in
                                      results[off : off + len(q)]]
                    off += len(q)
                    event.set()
            except Exception as e:  # noqa: BLE001 — deliver to callers
                for _q, _k, event, slot in batch:
                    slot["error"] = e
                    event.set()


class _QueryBatcher:
    """EvalFeed-compatible batcher over an in-memory list of raw query
    strings (ids are list indices as strings)."""

    def __init__(self, text_batcher, queries: Sequence[str]):
        self._tb = text_batcher
        self._queries = list(queries)

    def __call__(self, ids: Sequence[str]) -> Dict[str, np.ndarray]:
        caps = [self._queries[int(i)] for i in ids]
        return self._tb.encode_captions(caps, ids)


def _mask_tail(scores, n_valid):
    """-inf out gallery slots beyond the live count (ingest capacity
    padding); n_valid is a traced scalar, so growth never recompiles."""
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    return jnp.where(cols < n_valid, scores, -jnp.inf)


@partial(jax.jit, static_argnames=("k", "heads"))
def _score_topk(tn, vn, n_valid, k: int, heads: int):
    scores = jnp.dot(tn, vn.T, preferred_element_type=jnp.float32) / heads
    return jax.lax.top_k(_mask_tail(scores, n_valid), k)


@partial(jax.jit, static_argnames=("k", "heads"))
def _score_topk_int8(tq, ts, vq, vs, n_valid, k: int, heads: int):
    from ..ops.quantized import int8_scores

    scores = int8_scores(tq, ts, vq, vs) / heads
    return jax.lax.top_k(_mask_tail(scores, n_valid), k)


def _make_sharded_scorers(mesh, axis: str = "dp"):
    """Mesh analogs of _score_topk / _score_topk_int8: the gallery rows
    are sharded over ``axis``, each device scores its shard and takes a
    local top-k, and only k candidate rows per device ride the
    interconnect (all_gather + merge) — the live-serving form of
    ``parallel.sim_engine.sharded_topk`` with a TRACED live-row count so
    ingest growth never recompiles."""
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]

    def _merge(vals, gidx, k, k_local):
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
        fvals, fpos = jax.lax.top_k(all_vals, min(k, k_local * n))
        return fvals, jnp.take_along_axis(all_idx, fpos, axis=1)

    @partial(jax.jit, static_argnames=("k", "heads"))
    def bf16_topk(tn, vn, n_valid, k: int, heads: int):
        shard = vn.shape[0] // n
        k_local = min(k, shard)

        def local(tn_, n_valid_, vn_local):
            col0 = jax.lax.axis_index(axis) * shard
            scores = jnp.dot(tn_, vn_local.T,
                             preferred_element_type=jnp.float32) / heads
            cols = col0 + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1)
            scores = jnp.where(cols < n_valid_, scores, -jnp.inf)
            vals, li = jax.lax.top_k(scores, k_local)
            return _merge(vals, li + col0, k, k_local)

        fn = jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P(), P(axis)),
            out_specs=(P(), P()), check_vma=False,
        )
        return fn(tn, n_valid, vn)

    @partial(jax.jit, static_argnames=("k", "heads"))
    def int8_topk(tq, ts, vq, vs, n_valid, k: int, heads: int):
        from ..ops.quantized import int8_scores

        shard = vq.shape[0] // n
        k_local = min(k, shard)

        def local(tq_, ts_, n_valid_, vq_local, vs_local):
            col0 = jax.lax.axis_index(axis) * shard
            scores = int8_scores(tq_, ts_, vq_local, vs_local) / heads
            cols = col0 + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1)
            scores = jnp.where(cols < n_valid_, scores, -jnp.inf)
            vals, li = jax.lax.top_k(scores, k_local)
            return _merge(vals, li + col0, k, k_local)

        fn = jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P(), P(), P(axis), P(axis)),
            out_specs=(P(), P()), check_vma=False,
        )
        return fn(tq, ts, n_valid, vq, vs)

    return bf16_topk, int8_topk


class RetrievalService:
    """Checkpoint + feature collection -> live text-to-video search.

    gallery_dtype:
      'bf16'  — exact mean-of-cosines scores (gallery = V x H*d bf16 in HBM)
      'int8'  — half the HBM (symmetric per-row int8 + f32 scales); scores
                carry the quantization error (measured top-1000 overlap
                with exact at the 1M x 4096 design point: 1.0000 —
                shell/bench_int8_topk.py), ~1.6x the MXU rate. RANKINGS
                are reliable; score VALUES are not cosine-scale (up to
                2.55 absolute error, BENCH_INT8_r03.json) — a warning is
                logged at construction. For exact score values use the
                predictor's rescored path (--int8_gallery 1), which
                re-embeds nominated candidates in full precision.

    Requires every active text modality to be live-encodable (bow / w2v /
    gru / netvlad / in-graph bert / live clip tower). Precomputed-only
    text configs cannot embed ad-hoc queries — same constraint the
    negation scorer documents.
    """

    _BUCKETS = (1, 8, 64, 512)

    def __init__(
        self,
        model_path: str,
        rootpath: str,
        collection: str,
        batch_size: int = 512,
        gallery_dtype: str = "bf16",
        max_frame: Optional[int] = None,
        capacity: Optional[int] = None,
        gallery_cache: Optional[str] = None,
        mesh=None,
    ) -> None:
        from ..data import TextBatcher
        from .predictor import build_vis_feed
        from ..utils.misc import enable_compile_cache

        enable_compile_cache()

        ckpt = load_checkpoint(model_path)
        self.config = ckpt["config"]
        measure = getattr(self.config, "measure", "cosine")
        if measure != "cosine":
            # hist (Jaccard) scoring materializes (B, V, D) intermediates —
            # not a servable shape against an HBM-resident gallery, and
            # silently ranking a hist-trained model by cosine would
            # mis-serve it
            raise ValueError(
                f"RetrievalService only serves measure='cosine' checkpoints "
                f"(this one was trained/validated with measure={measure!r}; "
                "use do_predictor.py for batch evaluation)"
            )
        featurizers = rebuild_featurizers(ckpt, rootpath)
        dead = [n for n, f in featurizers.items() if f is None]
        if dead:
            raise ValueError(
                f"text modalities {dead} are precomputed-only in this "
                "config; ad-hoc queries cannot be embedded. Serve a "
                "checkpoint whose text encoders are live (bow/w2v/gru/"
                "netvlad/in-graph bert/live clip)."
            )
        model, variables, self.spec = rebuild_model(ckpt)
        self.embedder = Embedder(model, variables)
        self._text_batcher = TextBatcher(
            source=None, featurizers=featurizers,
            max_txtlength=getattr(self.config, "max_txtlength", 77),
            # fixed widths: variable-width arrays (netvlad tokens) must not
            # recompile the text tower per request
            pad_full=True,
        )
        self._lock = threading.Lock()

        # -- resident gallery -------------------------------------------
        if gallery_dtype not in ("bf16", "int8"):
            raise ValueError(f"gallery_dtype {gallery_dtype!r}")
        self._quantize = None
        if gallery_dtype == "int8":
            from ..ops.quantized import quantize_rows

            self._quantize = jax.jit(quantize_rows)
            # raw int8 scores are rank-faithful but NOT cosine-scale
            # (measured up to 2.55 absolute error at the 1M design point,
            # BENCH_INT8_r03.json); consumers needing exact score values
            # must use the rescored path (do_predictor --int8_gallery 1
            # re-embeds nominated candidates and dumps exact scores)
            logger.warning(
                "gallery_dtype='int8': search() scores are quantized "
                "approximations on the int8 scale — rankings are reliable "
                "(top-1000 overlap 1.0000 at the 1M design point) but "
                "score VALUES are not cosine-exact; use the predictor's "
                "--int8_gallery rescored path when exact scores matter"
            )
        # gallery_cache: embedding a large gallery costs one full vis-tower
        # pass (minutes at v3c1 scale); a snapshot of the SERVING-form
        # arrays (bf16 rows, or int8 rows + scales) keyed on the checkpoint
        # identity + collection + dtype makes restarts instant and
        # bit-identical to a fresh embed. Snapshots hold the INITIAL
        # gallery only — live-ingested rows are not persisted (replay
        # ingest sources after a restart).
        snap = (self._load_snapshot(gallery_cache, model_path, collection,
                                    gallery_dtype)
                if gallery_cache else None)
        def _cap(n_live: int) -> int:
            cap = max(int(capacity or 0), n_live)
            if mesh is not None:
                # gallery rows shard over 'dp': round the preallocation up
                # so every device owns an equal slab
                dp = mesh.shape.get("dp", 1)
                cap = -(-cap // dp) * dp
            return cap

        if snap is not None:
            self.vis_ids = [str(v) for v in snap["vis_ids"]]
            self.heads = int(snap["heads"])
            self._count = len(self.vis_ids)
            self.capacity = _cap(self._count)
            pad = self.capacity - self._count

            def up(a):
                a = np.asarray(a)
                if pad:
                    a = np.concatenate(
                        [a, np.zeros((pad,) + a.shape[1:], a.dtype)])
                return jnp.asarray(a)

            if gallery_dtype == "int8":
                self._vq, self._vs = up(snap["vq"]), up(snap["vs"])
                self._vn = None
            else:
                self._vn = up(snap["vn_bf16"].view(jnp.bfloat16))
                self._vq = self._vs = None
            logger.info("gallery restored from snapshot %s (%d videos)",
                        gallery_cache, self._count)
        else:
            feed, self.vis_ids = build_vis_feed(
                rootpath, collection, self.config, batch_size,
                max_frame=max_frame,
            )
            from ..ops.pallas_kernels import flatten_heads

            embs, ids = self.embedder.embed_vis(feed)
            assert ids == self.vis_ids
            self.heads = embs.shape[1] if embs.ndim == 3 else 1
            vn = flatten_heads(embs)
            # ingest capacity: the gallery arrays preallocate to `capacity`
            # rows (slots beyond the live count are masked -inf at query
            # time), so add_videos() writes in place — no reallocation, no
            # recompilation as the gallery grows
            self._count = len(self.vis_ids)
            self.capacity = _cap(self._count)
            if self.capacity > vn.shape[0]:
                vn = jnp.pad(vn, ((0, self.capacity - vn.shape[0]), (0, 0)))
            if gallery_dtype == "int8":
                self._vq, self._vs = self._quantize(vn)
                self._vq.block_until_ready()
                self._vn = None
            else:
                self._vn = vn.astype(jnp.bfloat16)
                self._vn.block_until_ready()
                self._vq = self._vs = None
            if gallery_cache:
                self._save_snapshot(gallery_cache, model_path, collection,
                                    gallery_dtype)
        self._id_set = set(self.vis_ids)
        self.gallery_dtype = gallery_dtype
        self.mesh = mesh
        if mesh is not None:
            # shard the resident gallery rows over 'dp' and route scoring
            # through shard_map local-topk + k-row all_gather merges —
            # n chips serve an n-times larger gallery (2n x for int8)
            from ..parallel import shard_batch

            if self._vn is not None:
                self._vn = shard_batch(self._vn, mesh)
            else:
                self._vq = shard_batch(self._vq, mesh)
                self._vs = shard_batch(self._vs, mesh)
            self._topk_bf16, self._topk_int8 = _make_sharded_scorers(mesh)
        else:
            self._topk_bf16, self._topk_int8 = _score_topk, _score_topk_int8
        self._stats = {"searches": 0, "queries": 0, "search_seconds": 0.0,
                       "search_seconds_max": 0.0, "ingests": 0,
                       "ingested_rows": 0}
        # donated in-place row writes for ingest (never reallocates)
        self._write_rows = jax.jit(
            lambda buf, rows, start: jax.lax.dynamic_update_slice_in_dim(
                buf, rows, start, 0
            ),
            donate_argnums=(0,),
        )
        nbytes = int(
            (self._vn.size * 2) if self._vn is not None
            else (self._vq.size + self._vs.size * 4)
        )
        width = (self._vn if self._vn is not None else self._vq).shape[1]
        logger.info(
            "serving %d videos (%s gallery, capacity %d, %.1f MB HBM), "
            "%d heads x %d dims",
            self._count, gallery_dtype, self.capacity, nbytes / 1e6,
            self.heads, width // self.heads,
        )

    @staticmethod
    def _snapshot_key(model_path: str, collection: str, dtype: str) -> str:
        p = os.path.abspath(model_path)
        return f"{p}|{os.path.getmtime(p):.6f}|{collection}|{dtype}"

    def _load_snapshot(self, path: str, model_path: str, collection: str,
                       dtype: str):
        if not os.path.exists(path):
            return None
        try:
            snap = np.load(path, allow_pickle=False)
        except (OSError, ValueError) as e:
            logger.warning("gallery snapshot %s unreadable (%s); re-embedding",
                           path, e)
            return None
        key = self._snapshot_key(model_path, collection, dtype)
        if str(snap["key"]) != key:
            logger.info("gallery snapshot %s is for a different "
                        "checkpoint/collection/dtype; re-embedding", path)
            return None
        return snap

    def _save_snapshot(self, path: str, model_path: str, collection: str,
                       dtype: str) -> None:
        arrays = {
            "key": np.asarray(
                self._snapshot_key(model_path, collection, dtype)),
            "vis_ids": np.asarray(self.vis_ids),
            "heads": np.asarray(self.heads),
        }
        n = self._count  # persist live rows only, not preallocated slots
        if dtype == "int8":
            arrays["vq"] = np.asarray(self._vq[:n])
            arrays["vs"] = np.asarray(self._vs[:n])
        else:
            arrays["vn_bf16"] = np.asarray(self._vn[:n]).view(np.uint16)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
        logger.info("gallery snapshot written to %s (%d videos)", path, n)

    def add_videos(
        self,
        vis_ids: Sequence[str],
        features: Dict[str, np.ndarray],
        batch_size: int = 64,
    ) -> int:
        """Live gallery ingest: embed new videos through the vis tower and
        write them into preallocated HBM slots. ``features`` carries the
        same arrays a VisBatcher batch would (video-level feature name ->
        (B, D); FrameLAFF configs additionally '<name>@frames'/'@mask').
        Returns the new live count; queries see the videos immediately."""
        from ..ops.pallas_kernels import flatten_heads

        vis_ids = list(vis_ids)
        n = len(vis_ids)
        if n == 0:
            return self._count
        if len(set(vis_ids)) != n:
            raise ValueError("duplicate ids within the ingest request")
        rows = {}
        for k, v in features.items():
            v = np.asarray(v, dtype=np.float32)
            if v.ndim != 2 or v.shape[0] != n:
                raise ValueError(
                    f"features[{k!r}] must be ({n}, D) rows, got {v.shape}"
                )
            rows[k] = v

        class _Rows:
            def __call__(_s, ids):
                idx = [int(i) for i in ids]
                return {k: v[idx] for k, v in rows.items()}

        # fixed embed batch: EvalFeed pads the tail chunk to batch_size, so
        # every ingest size reuses one compiled vis tower
        feed = EvalFeed([str(i) for i in range(n)], _Rows(),
                        batch_size=batch_size)
        # ALL count/duplicate checks live under the lock: a concurrent
        # ingest that passed a pre-lock check could move _count past
        # capacity, and dynamic_update_slice CLAMPS out-of-bounds starts —
        # it would silently overwrite the previous ingest's rows
        with self._lock:
            dup = set(vis_ids) & self._id_set
            if dup:
                raise ValueError(f"videos already served: {sorted(dup)[:5]}")
            if self._count + n > self.capacity:
                raise ValueError(
                    f"gallery capacity exhausted ({self._count}+{n} > "
                    f"{self.capacity}); construct with a larger capacity="
                )
            embs, _ = self.embedder.embed_vis(feed)
            new = flatten_heads(embs)
            # round the written row count up to the embed batch when the
            # headroom allows, so repeat ingests of varying sizes reuse one
            # _write_rows executable (the pad rows land beyond _count,
            # where queries mask them out and later ingests overwrite)
            n_write = new.shape[0]
            if (n_write < batch_size
                    and self._count + batch_size <= self.capacity):
                pad = batch_size - n_write
                new = jnp.pad(new, ((0, pad), (0, 0)))
            if self.gallery_dtype == "int8":
                q, s = self._quantize(new)
                self._vq = self._write_rows(self._vq, q, self._count)
                self._vs = self._write_rows(self._vs, s, self._count)
            else:
                self._vn = self._write_rows(
                    self._vn, new.astype(jnp.bfloat16), self._count
                )
            self.vis_ids.extend(vis_ids)
            self._id_set.update(vis_ids)
            self._count += n
            self._stats["ingests"] += 1
            self._stats["ingested_rows"] += n
        logger.info("ingested %d videos (live count %d / capacity %d)",
                    n, self._count, self.capacity)
        return self._count

    # jit-shape buckets: both the query count AND k are static jit args of
    # the gallery-sized score+top-k program, so each is rounded up to a
    # fixed grid (and results sliced back) — otherwise a client cycling
    # sizes forces a fresh compile per distinct value (latency spikes and
    # an unbounded executable cache; on a served endpoint, a trivial DoS).
    # The k grid caps at its largest bucket (clamped by the FIXED capacity,
    # never the live count, so ingest growth cannot recompile anything).
    _K_BUCKETS = (10, 100, 1000, 10000)

    def _bucket(self, n: int) -> int:
        for b in self._BUCKETS:
            if n <= b:
                return b
        return self._BUCKETS[-1]

    def search(
        self, queries: Sequence[str], k: int = 10
    ) -> List[List[Tuple[str, float]]]:
        """Ranked (vis_id, score) lists, one per query, best first."""
        if not queries:
            return []
        k = int(k)
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        k_exec = next((b for b in self._K_BUCKETS if k <= b),
                      self._K_BUCKETS[-1])
        k_exec = min(k_exec, self.capacity)
        out: List[List[Tuple[str, float]]] = []
        t0 = time.perf_counter()
        with self._lock:  # one compiled executable at a time
            k = min(k, self._count, k_exec)
            for start in range(0, len(queries), self._BUCKETS[-1]):
                chunk = list(queries[start : start + self._BUCKETS[-1]])
                out.extend(self._search_chunk(chunk, k, k_exec))
            self._stats["searches"] += 1
            self._stats["queries"] += len(queries)
            dt = time.perf_counter() - t0
            self._stats["search_seconds"] += dt
            self._stats["search_seconds_max"] = max(
                self._stats["search_seconds_max"], dt)
        return out

    def metrics(self) -> Dict:
        """Counters for the /metrics endpoint (JSON-serializable)."""
        with self._lock:
            s = dict(self._stats)
        s.update(
            gallery=self._count,
            capacity=self.capacity,
            dtype=self.gallery_dtype,
            heads=self.heads,
        )
        return s

    def _search_chunk(self, chunk, k, k_exec):
        from ..ops.pallas_kernels import flatten_heads

        bucket = self._bucket(len(chunk))
        feed = EvalFeed(
            [str(i) for i in range(len(chunk))],
            _QueryBatcher(self._text_batcher, chunk),
            batch_size=bucket,
        )
        txt_embs, _ = self.embedder.embed_txt(feed)
        tn = flatten_heads(txt_embs)
        if tn.shape[0] < bucket:
            # the embedder slices its padded batch back to the real count;
            # re-pad so the score+top-k executable only ever sees bucket
            # shapes (padded rows are sliced off the results below)
            tn = jnp.pad(tn, ((0, bucket - tn.shape[0]), (0, 0)))
        n_valid = jnp.int32(self._count)
        if self.gallery_dtype == "int8":
            tq, ts = self._quantize(tn)
            vals, idx = self._topk_int8(tq, ts, self._vq, self._vs, n_valid,
                                        k_exec, self.heads)
        else:
            vals, idx = self._topk_bf16(tn.astype(jnp.bfloat16), self._vn,
                                        n_valid, k_exec, self.heads)
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        return [
            [(self.vis_ids[int(j)], float(v)) for j, v in zip(row_i, row_v)]
            for row_i, row_v in zip(idx[: len(chunk), :k], vals[: len(chunk), :k])
        ]
