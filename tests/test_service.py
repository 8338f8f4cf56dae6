"""Online retrieval serving (laff_tpu.engine.service + do_server HTTP).

TPU-native extension: the reference is batch-only. The service embeds the
gallery once and answers ad-hoc text queries against the HBM-resident
gallery."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from laff_tpu.engine import Options
from laff_tpu.engine.trainer import main as train_main

from helpers import build_collection, build_w2v


@pytest.fixture(scope="module")
def served_world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    build_collection(root, "toytrain", n_videos=24, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=12, caps_per_video=1, seed=5)
    build_collection(root, "toytest", n_videos=20, caps_per_video=1, seed=9)
    build_w2v(root)
    result = train_main(Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=16, batch_size=16,
        model_prefix="serve", metric="mir",
    ))
    return root, os.path.join(result["model_path"], "model_best.pth.tar")


def _test_captions(root):
    caps = {}
    path = os.path.join(root, "toytest", "TextData", "toytest.caption.txt")
    for line in open(path):
        cap_id, caption = line.strip().split(" ", 1)
        caps[cap_id.split("#")[0]] = caption
    return caps


def test_service_search(served_world):
    from laff_tpu.engine.service import RetrievalService

    root, ckpt = served_world
    svc = RetrievalService(ckpt, root, "toytest")
    caps = _test_captions(root)
    vids = list(caps)
    results = svc.search([caps[v] for v in vids], k=5)
    assert len(results) == len(vids)
    for row in results:
        assert len(row) == 5
        scores = [s for _, s in row]
        assert scores == sorted(scores, reverse=True)
        assert all(vid in svc.vis_ids for vid, _ in row)
    # the trained model retrieves most queries' own videos in the top 5
    hits = sum(v in [vid for vid, _ in row] for v, row in zip(vids, results))
    assert hits >= len(vids) * 0.5, f"{hits}/{len(vids)} recall@5"
    # deterministic: a repeat query returns identical rankings
    again = svc.search([caps[vids[0]]], k=5)
    assert [i for i, _ in again[0]] == [i for i, _ in results[0]]
    # bucket edge: odd batch sizes pad to the compiled bucket and back
    three = svc.search([caps[v] for v in vids[:3]], k=2)
    assert len(three) == 3 and all(len(r) == 2 for r in three)


def test_service_int8_matches_bf16_order(served_world, caplog):
    import logging

    from laff_tpu.engine.service import RetrievalService

    root, ckpt = served_world
    caps = list(_test_captions(root).values())[:6]
    exact = RetrievalService(ckpt, root, "toytest").search(caps, k=3)
    import laff_tpu.engine.service as S

    S.logger.addHandler(caplog.handler)  # laff_tpu loggers don't propagate
    try:
        with caplog.at_level(logging.WARNING):
            svc8 = RetrievalService(ckpt, root, "toytest",
                                    gallery_dtype="int8")
    finally:
        S.logger.removeHandler(caplog.handler)
    # int8 scores are not cosine-scale — construction must warn the
    # consumer toward the rescored path (VERDICT r3 weak item 7)
    assert any("not cosine-exact" in r.message for r in caplog.records)
    quant = svc8.search(caps, k=3)
    # int8 carries quantization error; on this tiny well-separated world
    # the top-1 must agree
    for e, q in zip(exact, quant):
        assert e[0][0] == q[0][0]


def test_live_ingest(served_world):
    """add_videos: new videos land in preallocated HBM slots and become
    searchable immediately; capacity and duplicate guards trip loudly."""
    from laff_tpu.engine.service import RetrievalService
    from laff_tpu.store.bigfile import BigFile

    root, ckpt = served_world
    build_collection(root, "toyextra", n_videos=6, caps_per_video=1, seed=21)
    svc = RetrievalService(ckpt, root, "toytest", capacity=24)
    assert len(svc.vis_ids) == 20 and svc.capacity == 24

    extra_ids = [f"xv{i}" for i in range(4)]
    feats = {}
    for name in ("clip_ft", "x3d"):
        bf = BigFile(os.path.join(root, "toyextra", "FeatureData", name))
        _, rows = bf.gather([f"video{i}" for i in range(4)])
        feats[name] = rows
    # baseline: a probe caption's results before ingest
    probe = "the dog runs in the park"
    before = svc.search([probe], k=20)[0]
    assert svc.add_videos(extra_ids, feats) == 24
    after = svc.search([probe], k=24)[0]
    assert len(after) == 24
    assert set(i for i, _ in after) == set(svc.vis_ids)
    # pre-existing videos keep their scores bit-for-bit (slots untouched)
    before_scores = dict(before)
    after_scores = dict(after)
    for vid, s in before_scores.items():
        np.testing.assert_allclose(after_scores[vid], s, rtol=1e-6)

    # guards: duplicates, capacity, row-count mismatch
    with pytest.raises(ValueError, match="already served"):
        svc.add_videos(["xv0"], {k: v[:1] for k, v in feats.items()})
    with pytest.raises(ValueError, match="capacity"):
        svc.add_videos(["y0"], {k: v[:1] for k, v in feats.items()})
    svc2 = RetrievalService(ckpt, root, "toytest", capacity=30)
    with pytest.raises(ValueError, match="rows"):
        svc2.add_videos(["z0", "z1"], {k: v[:1] for k, v in feats.items()})

    # int8 gallery ingests too
    svc8 = RetrievalService(ckpt, root, "toytest", capacity=24,
                            gallery_dtype="int8")
    svc8.add_videos(extra_ids, feats)
    r8 = svc8.search([probe], k=24)[0]
    assert len(r8) == 24


def test_live_ingest_padded_writes(served_world):
    """With headroom, ingest writes round up to the embed batch (one
    compiled write shape); back-to-back ingests must not corrupt each
    other's rows through the pad region."""
    from laff_tpu.engine.service import RetrievalService
    from laff_tpu.store.bigfile import BigFile

    root, ckpt = served_world
    build_collection(root, "toypad", n_videos=6, caps_per_video=1, seed=31)
    svc = RetrievalService(ckpt, root, "toytest", capacity=200)
    bf = {n: BigFile(os.path.join(root, "toypad", "FeatureData", n))
          for n in ("clip_ft", "x3d")}

    def feats(lo, hi):
        return {n: b.gather([f"video{i}" for i in range(lo, hi)])[1]
                for n, b in bf.items()}

    assert svc.add_videos(["pa", "pb"], feats(0, 2)) == 22
    assert svc.add_videos(["pc"], feats(2, 3)) == 23
    out = svc.search(["the dog runs"], k=23)[0]
    ids = [i for i, _ in out]
    assert len(ids) == 23 and len(set(ids)) == 23
    assert {"pa", "pb", "pc"} <= set(ids)


def test_http_server(served_world):
    import do_server

    root, ckpt = served_world
    from laff_tpu.engine.service import RetrievalService

    svc = RetrievalService(ckpt, root, "toytest")
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 do_server.make_handler(svc, 10))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["gallery"] == 20

        caps = list(_test_captions(root).values())[:2]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"queries": caps, "k": 4}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        assert len(body["results"]) == 2
        assert all(len(row) == 4 for row in body["results"])
        assert all("id" in e and "score" in e for e in body["results"][0])

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"queries": "not a list"}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=30)
        assert exc.value.code == 400

        # ingest over HTTP: capacity guard surfaces as a 400 (svc has no
        # free slots), malformed body as a 400 too
        ing = urllib.request.Request(
            f"http://127.0.0.1:{port}/ingest",
            data=json.dumps({"ids": ["zz"], "features":
                             {"clip_ft": [[0.0] * 16], "x3d": [[0.0] * 12]}}
                            ).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(ing, timeout=60)
        assert exc.value.code == 400
        bad_ing = urllib.request.Request(
            f"http://127.0.0.1:{port}/ingest",
            data=json.dumps({"ids": "zz"}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad_ing, timeout=30)
        assert exc.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_service_frame_laff(tmp_path):
    """FrameLAFF checkpoints serve too: the gallery feed carries the padded
    frame arrays through the two-level fusion tower."""
    from laff_tpu.engine.service import RetrievalService

    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=18, caps_per_video=2, seed=1,
                     frame_feat=True)
    build_collection(root, "toyval", n_videos=8, caps_per_video=1, seed=6,
                     frame_feat=True)
    build_collection(root, "toytest", n_videos=10, caps_per_video=1, seed=9,
                     frame_feat=True)
    build_w2v(root)
    result = train_main(Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny_frame", num_epochs=2, batch_size=6,
        model_prefix="serve_frame",
    ))
    svc = RetrievalService(
        os.path.join(result["model_path"], "model_best.pth.tar"),
        root, "toytest",
    )
    out = svc.search(["the dog runs fast"], k=4)
    assert len(out[0]) == 4
    scores = [s for _, s in out[0]]
    assert scores == sorted(scores, reverse=True)


def test_service_rejects_hist_measure(tmp_path):
    """A hist-trained checkpoint must not be silently served with cosine
    ranking — the measure guard trips at construction."""
    from laff_tpu.engine.service import RetrievalService

    import laff_tpu.engine.service as S

    class Cfg:
        measure = "hist"

    orig_load = S.load_checkpoint
    S.load_checkpoint = lambda p: {"config": Cfg(), "params": {}, "spec": None}
    try:
        with pytest.raises(ValueError, match="measure"):
            RetrievalService("x", str(tmp_path), "none")
    finally:
        S.load_checkpoint = orig_load


def test_service_rejects_precomputed_only_text(tmp_path):
    """A config whose text side is precomputed-only cannot embed ad-hoc
    queries; the service must fail loudly at construction."""
    from laff_tpu.engine.service import RetrievalService

    # cheapest honest route: patch rebuild_featurizers to return a
    # precomputed-only bank and confirm the guard trips before anything
    # touches the model or gallery
    import laff_tpu.engine.service as S

    orig = S.rebuild_featurizers
    orig_load = S.load_checkpoint
    S.rebuild_featurizers = lambda ckpt, rootpath: {"clip": None}
    S.load_checkpoint = lambda p: {"config": None, "params": {}, "spec": None}
    try:
        with pytest.raises(ValueError, match="precomputed-only"):
            RetrievalService("x", str(tmp_path), "none")
    finally:
        S.rebuild_featurizers = orig
        S.load_checkpoint = orig_load


def test_micro_batcher_matches_direct(served_world):
    """Concurrent searches through the MicroBatcher return exactly what
    per-request search would, coalesced into fewer device dispatches."""
    from laff_tpu.engine.service import MicroBatcher, RetrievalService

    root, ckpt = served_world
    svc = RetrievalService(ckpt, root, "toytest")
    caps = _test_captions(root)
    vids = list(caps)
    direct = {v: svc.search([caps[v]], k=5)[0] for v in vids[:8]}

    mb = MicroBatcher(svc, window_ms=25.0)
    try:
        out = {}
        errs = []

        def worker(v, k):
            try:
                out[(v, k)] = mb.search([caps[v]], k=k)[0]
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        # mixed ks in one burst: per-request k honored by truncation
        threads = [threading.Thread(target=worker, args=(v, 5))
                   for v in vids[:8]]
        threads += [threading.Thread(target=worker, args=(vids[0], 2))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs

        def same_ranking(got, want):
            # a fused burst executes at a different query bucket, whose
            # reductions tile differently — ids must match exactly,
            # scores to float rounding
            assert [i for i, _ in got] == [i for i, _ in want]
            np.testing.assert_allclose([s for _, s in got],
                                       [s for _, s in want], rtol=1e-5)

        for v in vids[:8]:
            same_ranking(out[(v, 5)], direct[v])
        same_ranking(out[(vids[0], 2)], direct[vids[0]][:2])
        # the burst coalesced (9 requests, far fewer fused dispatches)
        assert mb.dispatches < 9
        # bad k raises per caller without poisoning the batch
        import pytest as _pytest

        with _pytest.raises(ValueError):
            mb.search(["anything"], k=0)
    finally:
        mb.close()


def test_http_server_with_micro_batching(served_world):
    """do_server's --batch_window_ms front serves concurrent clients
    correctly through the batcher."""
    import do_server
    from laff_tpu.engine.service import MicroBatcher, RetrievalService

    root, ckpt = served_world
    svc = RetrievalService(ckpt, root, "toytest")
    mb = MicroBatcher(svc, window_ms=10.0)
    front = do_server._Front(svc, mb)
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 do_server.make_handler(front, 10))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        caps = list(_test_captions(root).values())[:4]
        results = {}

        def client(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps({"queries": [caps[i]], "k": 3}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())["results"][0]

        clients = [threading.Thread(target=client, args=(i,))
                   for i in range(4)]
        for c in clients:
            c.start()
        for c in clients:
            c.join(timeout=150)
        assert len(results) == 4
        for i in range(4):
            row = results[i]
            assert len(row) == 3
            direct = svc.search([caps[i]], k=3)[0]
            assert [e["id"] for e in row] == [vid for vid, _ in direct]
            np.testing.assert_allclose(
                [e["score"] for e in row], [s for _, s in direct],
                rtol=1e-6)
        # /healthz still served by the underlying service via the facade
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["ok"]
    finally:
        server.shutdown()
        server.server_close()
        mb.close()


def test_gallery_snapshot_roundtrip(served_world, tmp_path):
    """A snapshot restore must serve bit-identical rankings to the fresh
    embed it was taken from, for both gallery dtypes; a stale snapshot
    (different checkpoint identity) is rejected and re-embedded."""
    from laff_tpu.engine.service import RetrievalService

    root, ckpt = served_world
    caps = list(_test_captions(root).values())[:4]
    for dtype in ("bf16", "int8"):
        cache = str(tmp_path / f"gal_{dtype}.npz")
        fresh = RetrievalService(ckpt, root, "toytest", gallery_dtype=dtype,
                                 gallery_cache=cache)
        assert os.path.exists(cache)
        want = fresh.search(caps, k=5)
        if dtype == "bf16":
            want_bf16 = want
        restored = RetrievalService(ckpt, root, "toytest",
                                    gallery_dtype=dtype,
                                    gallery_cache=cache)
        assert restored.vis_ids == fresh.vis_ids
        assert restored.search(caps, k=5) == want

        # restored galleries still ingest (capacity beyond the snapshot)
        svc = RetrievalService(ckpt, root, "toytest", gallery_dtype=dtype,
                               gallery_cache=cache, capacity=25)
        feats = {"clip_ft": np.random.default_rng(3).standard_normal(
                     (2, 16)).astype(np.float32),
                 "x3d": np.random.default_rng(4).standard_normal(
                     (2, 12)).astype(np.float32)}
        assert svc.add_videos(["zz1", "zz2"], feats) == 22

    # stale key: touching the checkpoint invalidates the snapshot
    cache = str(tmp_path / "gal_bf16.npz")
    os.utime(ckpt, (1, 1))
    again = RetrievalService(ckpt, root, "toytest", gallery_cache=cache)
    assert again.search(caps, k=5) == want_bf16  # re-embedded, same model


def test_service_metrics(served_world):
    from laff_tpu.engine.service import RetrievalService

    root, ckpt = served_world
    svc = RetrievalService(ckpt, root, "toytest")
    caps = list(_test_captions(root).values())
    svc.search(caps[:3], k=2)
    svc.search(caps[:1], k=2)
    m = svc.metrics()
    assert m["searches"] == 2 and m["queries"] == 4
    assert m["gallery"] == 20 and m["dtype"] == "bf16"
    assert m["search_seconds"] > 0
    import do_server
    from laff_tpu.engine.service import MicroBatcher

    mb = MicroBatcher(svc, window_ms=1.0)
    try:
        front = do_server._Front(svc, mb)
        front.search(caps[:2], k=2)
        m = front.metrics()
        assert m["batched_requests"] == 1 and m["fused_dispatches"] == 1
        assert m["searches"] == 3  # batcher dispatches through the service
    finally:
        mb.close()


def test_service_sharded_gallery_over_mesh(served_world):
    """mesh= shards the resident gallery rows over 'dp' (local top-k +
    k-row all_gather merge). Rankings must match the single-device
    service for both dtypes, and ingest must keep working on the sharded
    buffers."""
    from laff_tpu.engine.service import RetrievalService
    from laff_tpu.parallel import data_parallel_mesh
    from laff_tpu.store.bigfile import BigFile

    root, ckpt = served_world
    caps = list(_test_captions(root).values())[:6]
    mesh = data_parallel_mesh(4)
    for dtype in ("bf16", "int8"):
        single = RetrievalService(ckpt, root, "toytest", gallery_dtype=dtype)
        sharded = RetrievalService(ckpt, root, "toytest",
                                   gallery_dtype=dtype, mesh=mesh)
        want = single.search(caps, k=7)
        got = sharded.search(caps, k=7)
        for w, g in zip(want, got):
            assert [i for i, _ in g] == [i for i, _ in w]
            np.testing.assert_allclose([s for _, s in g],
                                       [s for _, s in w], rtol=1e-5)

    # capacity rounds up to the dp axis; ingest writes into sharded slabs
    build_collection(root, "toymesh", n_videos=4, caps_per_video=1, seed=41)
    svc = RetrievalService(ckpt, root, "toytest", capacity=25, mesh=mesh)
    assert svc.capacity == 28  # 25 rounded up to 4 devices
    feats = {n: BigFile(os.path.join(root, "toymesh", "FeatureData", n)
                        ).gather([f"video{i}" for i in range(3)])[1]
             for n in ("clip_ft", "x3d")}
    assert svc.add_videos(["ma", "mb", "mc"], feats) == 23
    out = svc.search(["the dog runs"], k=23)[0]
    ids = [i for i, _ in out]
    assert len(set(ids)) == 23 and {"ma", "mb", "mc"} <= set(ids)
