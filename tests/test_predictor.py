"""Predictor driver: train a tiny model, then run the CLI prediction flow
over the trained checkpoint (benchmark + AVS-style output paths)."""

import os
import pickle

import numpy as np
import pytest

from laff_tpu.engine import Options
from laff_tpu.engine.predictor import PredictOptions, main as predict_main
from laff_tpu.engine.trainer import main as train_main

from helpers import build_collection, build_w2v


@pytest.fixture(scope="module")
def trained_world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("world"))
    build_collection(root, "toytrain", n_videos=32, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=16, caps_per_video=1, seed=5)
    build_collection(root, "toytest", n_videos=20, caps_per_video=2, seed=9)
    build_w2v(root)
    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=8, batch_size=16,
        model_prefix="run_pred", metric="mir",
    )
    result = train_main(opt)
    return root, result["model_path"]


def test_predict_benchmark_collection(trained_world):
    root, model_path = trained_world
    opt = PredictOptions(
        testCollection="toytest",
        model_path=os.path.join(model_path, "model_best.pth.tar"),
        sim_name="run_pred",
        rootpath=root,
        query_sets="toytest.caption.txt",
        predict_result_file=os.path.join(root, "result_log", "result_test.txt"),
        batch_size=16,
    )
    results = predict_main(opt)
    res = results["toytest.caption.txt"]
    # mir comfortably above the random baseline (~0.18 for a 20-item
    # gallery); R@1 alone is too noisy at this scale
    assert res["t2v"][5] > 0.22, res["t2v"]

    # TSV rows written for both directions
    t2v_log = os.path.join(root, "result_log", "TextToVideo", "result_test.txt")
    v2t_log = os.path.join(root, "result_log", "VideoToText", "result_test.txt")
    assert os.path.exists(t2v_log) and os.path.exists(v2t_log)
    row = open(t2v_log).read().strip().split("\t")
    assert len(row) >= 9

    # top-500 rank dump pickle
    pkl = os.path.join(root, "toytest", "SimilarityIndex", "toytest.caption.txt",
                       "run_pred", "t2v.pkl")
    with open(pkl, "rb") as fh:
        shot_dict = pickle.load(fh)
    some_id = next(iter(shot_dict))
    entry = shot_dict[some_id]
    assert len(entry["rank_list"]) == 20  # gallery smaller than 500
    assert entry["sim_value"] == sorted(entry["sim_value"], reverse=True)
    assert entry["query"]  # caption text recorded


def test_predict_avs_style_dump(trained_world, monkeypatch):
    root, model_path = trained_world
    import laff_tpu.engine.predictor as P

    # treat toytest as an AVS collection to exercise the score-file path
    monkeypatch.setattr(P, "AVS_COLLECTIONS", ("toytest",))
    opt = PredictOptions(
        testCollection="toytest",
        model_path=os.path.join(model_path, "model_best.pth.tar"),
        sim_name="avs_run",
        rootpath=root,
        query_sets="toytest.caption.txt",
        batch_size=16,
    )
    results = P.main(opt)
    score_file = results["toytest.caption.txt"]["score_file"]
    lines = open(score_file).read().strip().split("\n")
    assert len(lines) == 40  # 20 videos x 2 captions
    parts = lines[0].split()
    assert len(parts) == 1 + 2 * 20  # txt_id + (vis_id, score) pairs
    scores = [float(s) for s in parts[2::2]]
    assert scores == sorted(scores, reverse=True)


def test_predict_int8_gallery_avs_dump(trained_world, monkeypatch):
    """--int8_gallery on a large AVS gallery: int8 HBM nomination + exact
    candidate re-embedding produces the same ranking dump as the exact
    streaming path (the margin covers this toy gallery fully)."""
    root, model_path = trained_world
    import laff_tpu.engine.predictor as P

    monkeypatch.setattr(P, "AVS_COLLECTIONS", ("toytest",))
    monkeypatch.setattr(P, "LARGE_GALLERY", 5)

    def run(sim_name, int8):
        opt = PredictOptions(
            testCollection="toytest",
            model_path=os.path.join(model_path, "model_best.pth.tar"),
            sim_name=sim_name, rootpath=root,
            query_sets="toytest.caption.txt", batch_size=8,
            overwrite=1, int8_gallery=int8,
        )
        score_file = P.main(opt)["toytest.caption.txt"]["score_file"]
        out = {}
        for line in open(score_file).read().strip().split("\n"):
            parts = line.split()
            out[parts[0]] = (parts[1::2], [float(s) for s in parts[2::2]])
        return out

    exact = run("avs_exact", 0)
    quant = run("avs_int8", 1)
    assert set(exact) == set(quant)
    for tid in exact:
        assert exact[tid][0] == quant[tid][0], tid  # same ranking order
        np.testing.assert_allclose(quant[tid][1], exact[tid][1],
                                   rtol=1e-5, atol=1e-6)


def test_predict_each_head_artifacts(trained_world):
    """--each_head writes per-space TSV rows AND per-head artifacts:
    perf.txt + full headN.id.sent.score.txt rank dumps (reference
    get_multi_predict_file, predictor.py:290-405 — which overwrites one
    file per head; we keep every head's dump)."""
    root, model_path = trained_world
    opt = PredictOptions(
        testCollection="toytest",
        model_path=os.path.join(model_path, "model_best.pth.tar"),
        sim_name="head_run",
        rootpath=root,
        query_sets="toytest.caption.txt",
        predict_result_file=os.path.join(root, "result_log", "head.txt"),
        batch_size=16,
        each_head=1,
    )
    results = predict_main(opt)
    per_head = results["toytest.caption.txt"]["per_head"]
    assert len(per_head) == 4  # tiny config heads

    outdir = os.path.join(root, "toytest", "SimilarityIndex",
                          "toytest.caption.txt", "head_run")
    perf = open(os.path.join(outdir, "perf.txt")).read()
    assert "head0" in perf and "head3" in perf and "mAP" in perf
    for h in range(4):
        lines = open(
            os.path.join(outdir, f"head{h}.id.sent.score.txt")
        ).read().strip().split("\n")
        assert len(lines) == 40  # 20 videos x 2 captions
        scores = [float(s) for s in lines[0].split()[2::2]]
        assert scores == sorted(scores, reverse=True)
        assert os.path.exists(os.path.join(
            root, "result_log", "TextToVideo", f"head{h}_head.txt"))
    # the heads are genuinely distinct spaces
    assert len({tuple(np.round(m, 6)) for m in per_head}) > 1


def test_predict_negation_scoring(trained_world):
    """--task3_caption activates boolean negation scoring: a query whose
    negated clause matches video B demotes B relative to the plain run
    (reference predictneg_adhoc, model/model.py:1473-1565)."""
    root, model_path = trained_world

    # per-video word sets from the synthetic captions
    words = {}
    cap_path = os.path.join(root, "toytest", "TextData", "toytest.caption.txt")
    for line in open(cap_path):
        tid, caption = line.strip().split(None, 1)
        vid = tid.split("#")[0]
        words.setdefault(vid, [w for w in caption.split() if w != "the"])

    # every video gets a query (v2t eval needs full coverage, as in the
    # reference); each query negates the words of another video
    vids = sorted(words, key=lambda v: int(v[5:]))
    pairs = [(vids[i], vids[(i + 5) % len(vids)]) for i in range(len(vids))]
    neg_lines, pos_lines = [], []
    for a, b in pairs:
        neg_lines.append(
            f"{a}#0 the {' '.join(words[a])} not {' '.join(words[b])}"
        )
        pos_lines.append(f"{a}#0 the {' '.join(words[a])}")
    tdir = os.path.join(root, "toytest", "TextData")
    open(os.path.join(tdir, "negquery.txt"), "w").write("\n".join(neg_lines))
    open(os.path.join(tdir, "posquery.txt"), "w").write("\n".join(pos_lines))

    def run(sim_name, query_set, task3_caption, neg_method="sub"):
        opt = PredictOptions(
            testCollection="toytest",
            model_path=os.path.join(model_path, "model_best.pth.tar"),
            sim_name=sim_name, rootpath=root, query_sets=query_set,
            predict_result_file=os.path.join(root, "result_log", "neg.txt"),
            batch_size=4, overwrite=1,
            task3_caption=task3_caption, neg_method=neg_method,
        )
        predict_main(opt)
        pkl = os.path.join(root, "toytest", "SimilarityIndex", query_set,
                           sim_name, "t2v.pkl")
        with open(pkl, "rb") as fh:
            return pickle.load(fh)

    # base: the positive clauses scored plainly — the same scoring base the
    # negation path uses before subtracting the negated-clause similarity
    base = run("neg_off", "posquery.txt", "no_task3_caption")
    adj = run("neg_on", "negquery.txt", "false")
    adj_mul = run("neg_on_mul", "negquery.txt", "false", neg_method="mul")

    def mean_rank_of_negated(dump):
        return np.mean(
            [dump[f"{a}#0"]["rank_list"].index(b) for a, b in pairs]
        )

    r_base = mean_rank_of_negated(base)
    r_sub = mean_rank_of_negated(adj)
    r_mul = mean_rank_of_negated(adj_mul)
    # negated videos are demoted on average by the subtraction
    assert r_sub > r_base, (r_base, r_sub)
    assert r_mul > r_base, (r_base, r_mul)
    # and the negation run's scores differ from the plain run's
    some = f"{pairs[0][0]}#0"
    assert adj[some]["sim_value"] != base[some]["sim_value"]


def test_predict_skip_guard(trained_world):
    """overwrite=0 + existing output -> skipped (no recompute)."""
    root, model_path = trained_world
    opt = PredictOptions(
        testCollection="toytest",
        model_path=os.path.join(model_path, "model_best.pth.tar"),
        sim_name="skip_run",
        rootpath=root,
        query_sets="toytest.caption.txt",
        batch_size=16,
    )
    out_dir = os.path.join(root, "toytest", "SimilarityIndex",
                           "toytest.caption.txt", "skip_run")
    os.makedirs(out_dir, exist_ok=True)
    open(os.path.join(out_dir, "id.sent.score.txt"), "w").write("sentinel")
    results = predict_main(opt)
    assert results == {}
    assert open(os.path.join(out_dir, "id.sent.score.txt")).read() == "sentinel"


def test_streaming_gallery_path(trained_world, monkeypatch):
    """Galleries above LARGE_GALLERY stream through blockwise scoring and
    produce the same metrics as the cached path."""
    import laff_tpu.engine.evaluator as EV
    import laff_tpu.engine.predictor as P

    root, model_path = trained_world
    opt = PredictOptions(
        testCollection="toytest",
        model_path=os.path.join(model_path, "model_best.pth.tar"),
        sim_name="stream_run",
        rootpath=root,
        query_sets="toytest.caption.txt",
        predict_result_file=os.path.join(root, "result_log", "stream.txt"),
        batch_size=8,
        overwrite=1,
    )
    cached = predict_main(opt)["toytest.caption.txt"]

    monkeypatch.setattr(P, "LARGE_GALLERY", 5)  # force streaming
    opt2 = PredictOptions(
        testCollection="toytest",
        model_path=os.path.join(model_path, "model_best.pth.tar"),
        sim_name="stream_run2",
        rootpath=root,
        query_sets="toytest.caption.txt",
        predict_result_file=os.path.join(root, "result_log", "stream2.txt"),
        batch_size=8,
        overwrite=1,
    )
    streamed = P.main(opt2)["toytest.caption.txt"]
    np.testing.assert_allclose(streamed["t2v"], cached["t2v"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(streamed["v2t"], cached["v2t"],
                               rtol=1e-5, atol=1e-6)

    # the streamed top-k pkl dump carries the same ranking values
    def load_pkl(sim):
        pkl = os.path.join(root, "toytest", "SimilarityIndex",
                           "toytest.caption.txt", sim, "t2v.pkl")
        with open(pkl, "rb") as fh:
            return pickle.load(fh)

    d1, d2 = load_pkl("stream_run"), load_pkl("stream_run2")
    assert set(d1) == set(d2)
    for tid in d1:
        np.testing.assert_allclose(d1[tid]["sim_value"], d2[tid]["sim_value"],
                                   rtol=1e-5, atol=1e-6)


def test_int8_streaming_topk_matches_exact():
    """int8_streaming_topk with a real nomination cut (C << V): the
    returned top-k equals the dense exact top-k, scores on the
    mean-of-cosines scale."""
    import jax
    import jax.numpy as jnp

    from laff_tpu.data.feed import EvalFeed
    from laff_tpu.engine import evaluator as EV
    from laff_tpu.ops.pallas_kernels import flatten_heads

    rng = np.random.default_rng(11)
    n_vis, heads, dim = 500, 2, 16
    vis = rng.standard_normal((n_vis, heads, dim)).astype(np.float32)
    txt = rng.standard_normal((40, heads, dim)).astype(np.float32)
    vis_ids = [f"v{i}" for i in range(n_vis)]

    class FakeEmbedder:
        variables = None

        def _vis(self, variables, batch):
            return jnp.asarray(batch["feat"])

        def embed_vis(self, feed):
            chunks, ids = [], []
            for item in feed:
                chunks.append(jnp.asarray(
                    batcher_rows(item["ids"]))[: item["valid"]])
                ids.extend(item["ids"])
            return jnp.concatenate(chunks), ids

    def batcher_rows(ids):
        return np.stack([vis[int(i[1:])] for i in ids])

    feed = EvalFeed(vis_ids, lambda ids: {"feat": batcher_rows(ids)},
                    batch_size=64)
    vals, idx, out_ids = EV.int8_streaming_topk(
        FakeEmbedder(), jnp.asarray(txt), feed, k=20, chunk_t=16
    )
    assert out_ids == vis_ids

    tn = flatten_heads(jnp.asarray(txt))
    vn = flatten_heads(jnp.asarray(vis))
    exact = np.asarray(EV._flat_scores_block(tn, vn, heads))
    evals, eidx = jax.lax.top_k(jnp.asarray(exact), 20)
    np.testing.assert_array_equal(idx, np.asarray(eidx))
    np.testing.assert_allclose(vals, np.asarray(evals), rtol=1e-5, atol=1e-6)


def test_streaming_benchmark_eval_exact_with_ties():
    """streaming_benchmark_eval (two-pass device counting, VERDICT r2
    item 6) is bit-exact vs the host full-matrix oracle, including
    duplicated gallery vectors (exact score ties)."""
    import jax
    import jax.numpy as jnp

    from laff_tpu.data.feed import EvalFeed
    from laff_tpu.engine import evaluator as EV
    from laff_tpu.eval import metrics as M
    from laff_tpu.ops.pallas_kernels import flatten_heads

    rng = np.random.default_rng(3)
    n_vis, caps_per, heads, dim = 37, 3, 2, 8
    vis = rng.normal(size=(n_vis, heads, dim)).astype(np.float32)
    vis[5] = vis[9]
    vis[20] = vis[9]  # duplicated vectors -> exact ties in every row
    vis_ids = [f"v{i}" for i in range(n_vis)]
    txt_ids = [f"v{i}#{j}" for i in range(n_vis) for j in range(caps_per)]
    txt = rng.normal(size=(len(txt_ids), heads, dim)).astype(np.float32)

    class FakeEmbedder:
        variables = None

        def _vis(self, variables, batch):
            return jnp.asarray(batch["feat"])

    feed = EvalFeed(
        vis_ids,
        lambda ids: {"feat": np.stack([vis[int(i[1:])] for i in ids])},
        batch_size=8,
    )
    out = EV.streaming_benchmark_eval(
        FakeEmbedder(), jnp.asarray(txt), txt_ids, feed, topk=10
    )

    # oracle scores from the SAME per-block matmuls the streaming path
    # runs (a single full-width gemm can differ in f32 last bits, which
    # flips tie-adjacent ranks — the ties themselves, being duplicated
    # columns, stay exact either way)
    tn = flatten_heads(jnp.asarray(txt))
    scores = np.concatenate(
        [
            np.asarray(
                EV._flat_scores_block(
                    tn, flatten_heads(jnp.asarray(vis[s : s + 8])), heads
                )
            )
            for s in range(0, n_vis, 8)
        ],
        axis=1,
    )

    # direct numpy oracle of the framework's canonical tie rule
    # (larger index first, ranks_from_scores_device semantics; the
    # reference's np.argsort quicksort tie order is arbitrary, so exact
    # ties have no reference-defined order to match)
    def rank_of(row, col):
        s = row[col]
        return 1 + int((row > s).sum()) + int(
            ((row == s) & (np.arange(len(row)) > col)).sum()
        )

    t2v_ranks = np.asarray(
        [rank_of(scores[q], int(txt_ids[q].split("#")[0][1:]))
         for q in range(len(txt_ids))]
    )
    np.testing.assert_array_equal(out["t2v_ranks"], t2v_ranks)
    np.testing.assert_allclose(out["t2v"], M.metrics_from_ranks(t2v_ranks),
                               rtol=1e-6, atol=1e-8)

    v2t_lists = []
    for v in range(n_vis):
        row = scores[:, v]
        pos = sorted(
            rank_of(row, q) for q in range(len(txt_ids))
            if txt_ids[q].split("#")[0] == f"v{v}"
        )
        v2t_lists.append(np.asarray(pos))
    np.testing.assert_allclose(
        out["v2t"], EV.metrics_from_positive_ranks(v2t_lists),
        rtol=1e-6, atol=1e-8,
    )
    vals, _ = jax.lax.top_k(jnp.asarray(scores), 10)
    np.testing.assert_array_equal(out["topk_vals"], np.asarray(vals))


def test_predict_concept_rerank(trained_world):
    """--rerank concept: a concept pkl aligned with the gallery blends
    concept-space similarity into the scores (CLI-reachable path)."""
    root, model_path = trained_world

    vis_ids = open(
        os.path.join(root, "toytest", "VideoSets", "toytest.txt")
    ).read().split()
    # concept matrix over a SUPERSET of the gallery in a different order
    # (exercises the vis_id -> pkl-column alignment)
    pkl_vids = vis_ids[::-1] + ["extra1", "extra2"]
    concepts = ["dog", "car", "water"]
    rng = np.random.default_rng(7)
    video_concept = rng.random((len(concepts), len(pkl_vids))).astype(np.float32)
    pkl_path = os.path.join(root, "concept.pkl")
    with open(pkl_path, "wb") as fh:
        pickle.dump(
            {"txt2video_cos_sim_matrix": video_concept,
             "txt_ids": np.array(concepts), "vis_ids": np.array(pkl_vids)},
            fh,
        )

    def run(sim_name, rerank):
        opt = PredictOptions(
            testCollection="toytest",
            model_path=os.path.join(model_path, "model_best.pth.tar"),
            sim_name=sim_name, rootpath=root,
            query_sets="toytest.caption.txt",
            predict_result_file=os.path.join(root, "result_log", "cr.txt"),
            batch_size=16, overwrite=1, rerank=rerank,
            concept_pkl=pkl_path, concept_topk=10,
            concept_caption=os.path.join(root, "toytest", "TextData",
                                         "toytest.caption.txt"),
        )
        return predict_main(opt)["toytest.caption.txt"]["t2v"]

    plain = run("cr_off", "none")
    blended = run("cr_on", "concept")
    assert len(blended) == 7 and np.isfinite(blended).all()
    assert tuple(blended) != tuple(plain)  # concept signal moved the metrics


# ---------------------------------------------------------------------------
# rank-path auto-selection (VERDICT r3 item 3)
# ---------------------------------------------------------------------------

def test_rank_path_policy(monkeypatch):
    """_rank_path: flat while the f32 score block fits the budget, Pallas
    beyond it on TPU, blockwise off-TPU; env override wins."""
    import jax

    from laff_tpu.engine import evaluator as EV

    monkeypatch.delenv("LAFF_TPU_RANK_PATH", raising=False)
    monkeypatch.setenv("LAFF_TPU_FLAT_SCORE_BUDGET", str(1000 * 1000 * 4))
    assert EV._rank_path(1000, 1000) == "flat"
    big = EV._rank_path(1001, 1000)
    if jax.default_backend() == "tpu":
        assert big == "pallas"
    else:
        assert big == "blockwise"
    # auto mode is dtype-aware: fused_sim_rank casts to bf16 internally,
    # so f32 embeddings beyond the budget must take blockwise (full
    # precision), never pallas — on ANY backend
    import jax.numpy as jnp
    assert EV._rank_path(1001, 1000, dtype=jnp.float32) == "blockwise"
    big_bf16 = EV._rank_path(1001, 1000, dtype=jnp.bfloat16)
    assert big_bf16 == big  # bf16 keeps the backend-native choice
    for forced in ("flat", "pallas", "blockwise"):
        monkeypatch.setenv("LAFF_TPU_RANK_PATH", forced)
        # a forced path wins regardless of dtype (explicit opt-in)
        assert EV._rank_path(10**9, 10**9) == forced
        assert EV._rank_path(10**9, 10**9, dtype=jnp.float32) == forced


def test_t2v_ranks_dispatch_boundary(monkeypatch):
    """t2v_ranks over the selection boundary: every path (flat XLA /
    tiled Pallas / shrunken blockwise) preserves the exact tie semantics
    on duplicated gallery rows (larger index wins) and near-exact rank
    agreement elsewhere (bf16 tiling may move near-ties by an ulp)."""
    import jax.numpy as jnp

    from laff_tpu.engine import evaluator as EV

    rng = np.random.default_rng(17)
    h, d = 2, 16
    base = rng.standard_normal((40, h, d)).astype(np.float32)
    vis = np.concatenate([base, base[:3]], axis=0)  # dups 0,1,2 at 40,41,42
    vis_ids = [f"v{i}" for i in range(len(vis))]
    txt = np.concatenate([base[:3], rng.standard_normal((20, h, d)).astype(np.float32)])
    txt_ids = [f"v{i}#0" for i in (40, 41, 42)] + [f"v{i}#0" for i in range(3, 23)]

    def run(path, budget=None):
        monkeypatch.setenv("LAFF_TPU_RANK_PATH", path)
        if budget is not None:
            monkeypatch.setenv("LAFF_TPU_FLAT_SCORE_BUDGET", str(budget))
        return EV.t2v_ranks(jnp.asarray(txt), jnp.asarray(vis),
                            txt_ids, vis_ids, block=8)

    flat = run("flat")
    pallas = run("pallas")
    blockwise = run("blockwise", budget=43 * 4 * 8)
    # ties: queries 0-2 target the LATER duplicate -> exact rank 1 on
    # every path (duplicated rows survive any rounding identically)
    for ranks in (flat, pallas, blockwise):
        np.testing.assert_array_equal(ranks[:3], [1, 1, 1])
    np.testing.assert_array_equal(flat, blockwise)  # same program family
    assert (pallas == flat).mean() > 0.9
    np.testing.assert_allclose(pallas, flat, atol=2)


def test_streaming_gallery_cache_skips_pass2(monkeypatch):
    """With the HBM gallery cache active (default), pass 2 rescoring from
    cache slices is bit-identical to the uncached two-pass streaming."""
    import jax.numpy as jnp

    from laff_tpu.data.feed import EvalFeed
    from laff_tpu.engine import evaluator as EV

    rng = np.random.default_rng(23)
    n_vis, heads, dim = 37, 2, 8
    vis = rng.normal(size=(n_vis, heads, dim)).astype(np.float32)
    vis[5] = vis[9]
    vis_ids = [f"v{i}" for i in range(n_vis)]
    txt_ids = [f"v{i}#0" for i in range(n_vis)]
    txt = rng.normal(size=(n_vis, heads, dim)).astype(np.float32)

    class FakeEmbedder:
        variables = None

        def _vis(self, variables, batch):
            return jnp.asarray(batch["feat"])

    def make_feed():
        return EvalFeed(
            vis_ids,
            lambda ids: {"feat": np.stack([vis[int(i[1:])] for i in ids])},
            batch_size=8,
        )

    monkeypatch.delenv("LAFF_TPU_RANK_PATH", raising=False)
    cached = EV.streaming_benchmark_eval(
        FakeEmbedder(), jnp.asarray(txt), txt_ids, make_feed(), topk=5)
    monkeypatch.setenv("LAFF_TPU_STREAM_GALLERY_BUDGET", "0")
    uncached = EV.streaming_benchmark_eval(
        FakeEmbedder(), jnp.asarray(txt), txt_ids, make_feed(), topk=5)
    np.testing.assert_array_equal(cached["t2v_ranks"], uncached["t2v_ranks"])
    np.testing.assert_array_equal(cached["topk_vals"], uncached["topk_vals"])
    np.testing.assert_allclose(cached["t2v"], uncached["t2v"], rtol=0, atol=0)
    np.testing.assert_allclose(cached["v2t"], uncached["v2t"], rtol=0, atol=0)


def test_streaming_pallas_dispatch(monkeypatch):
    """bf16 embeddings + forced pallas: streaming t2v ranks come from
    fused_sim_rank over the cached gallery (equal to calling the kernel
    directly on the same rows) and tie semantics hold."""
    import jax.numpy as jnp

    from laff_tpu.data.feed import EvalFeed
    from laff_tpu.engine import evaluator as EV
    from laff_tpu.ops.pallas_kernels import flatten_heads, fused_sim_rank

    rng = np.random.default_rng(29)
    n_vis, heads, dim = 21, 2, 8
    vis = rng.normal(size=(n_vis, heads, dim)).astype(np.float32)
    vis[4] = vis[12]
    vis_ids = [f"v{i}" for i in range(n_vis)]
    txt_ids = [f"v{i}#0" for i in range(n_vis)]
    txt = rng.normal(size=(n_vis, heads, dim)).astype(np.float32)
    txt[3] = vis[4]  # query 3 targets v4 whose duplicate v12 outranks it
    txt_ids[3] = "v4#0"

    class Bf16Embedder:
        variables = None

        def _vis(self, variables, batch):
            return jnp.asarray(batch["feat"]).astype(jnp.bfloat16)

    feed = EvalFeed(
        vis_ids,
        lambda ids: {"feat": np.stack([vis[int(i[1:])] for i in ids])},
        batch_size=8,
    )
    monkeypatch.setenv("LAFF_TPU_RANK_PATH", "pallas")
    out = EV.streaming_benchmark_eval(
        Bf16Embedder(), jnp.asarray(txt).astype(jnp.bfloat16),
        txt_ids, txt_ids and feed, topk=0)

    tn = flatten_heads(jnp.asarray(txt).astype(jnp.bfloat16))
    vn = flatten_heads(jnp.asarray(vis).astype(jnp.bfloat16))
    gt = jnp.asarray(np.asarray(
        [int(t.split("#")[0][1:]) for t in txt_ids], dtype=np.int32))
    direct = np.asarray(fused_sim_rank(tn, vn, gt, prenormalized=True))
    np.testing.assert_array_equal(out["t2v_ranks"], direct)
    assert out["t2v_ranks"][3] == 2  # later duplicate (v12) wins the tie


def test_streaming_pallas_guard_f32_text(monkeypatch):
    """f32 text + bf16 gallery cache + forced pallas must take the
    bit-exact rescore branch, NOT fused_sim_rank (which casts text to
    bf16 internally — rounding pass 1 never saw). Engineered near-tie:
    the query's two components differ by ~12 f32 ulps, so f32-text
    scoring ranks the gt first while bf16-cast text collapses them to a
    tie that a later gallery column wins."""
    import jax.numpy as jnp

    from laff_tpu.data.feed import EvalFeed
    from laff_tpu.engine import evaluator as EV

    dim = 8
    # gallery: v0 (the gt) = e1, v1 = e0; exact in bf16 and unit-norm
    vis = np.zeros((2, 1, dim), dtype=np.float32)
    vis[0, 0, 1] = 1.0
    vis[1, 0, 0] = 1.0
    # query [1, 1+1e-6, 0...]: f32 keeps s(v0) > s(v1); bf16 text ties
    txt = np.zeros((1, 1, dim), dtype=np.float32)
    txt[0, 0, 0] = 1.0
    txt[0, 0, 1] = 1.0 + 1e-6

    class Bf16Embedder:
        variables = None

        def _vis(self, variables, batch):
            return jnp.asarray(batch["feat"]).astype(jnp.bfloat16)

    def make_feed():
        return EvalFeed(
            ["v0", "v1"],
            lambda ids: {"feat": np.stack([vis[int(i[1:])] for i in ids])},
            batch_size=2,
        )

    monkeypatch.setenv("LAFF_TPU_RANK_PATH", "pallas")
    out = EV.streaming_benchmark_eval(
        Bf16Embedder(), jnp.asarray(txt), ["v0#0"], make_feed(), topk=0)
    assert out["t2v_ranks"][0] == 1  # f32 text precision preserved

    # sanity: the bf16-cast text the kernel would have used DOES flip
    # this rank (tie with the later column v1 counts), i.e. this test
    # discriminates the guard
    from laff_tpu.ops.pallas_kernels import flatten_heads, fused_sim_rank
    tn_bf = flatten_heads(jnp.asarray(txt).astype(jnp.bfloat16))
    vn_bf = flatten_heads(jnp.asarray(vis).astype(jnp.bfloat16))
    kernel_rank = np.asarray(fused_sim_rank(
        tn_bf, vn_bf, jnp.asarray([0], dtype=jnp.int32),
        prenormalized=True))
    assert kernel_rank[0] == 2
