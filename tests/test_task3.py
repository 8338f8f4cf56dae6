"""Negation-aware ('task3') training path: feed wiring + loss behavior."""

import os

import numpy as np
import pytest

from laff_tpu.engine import Options
from laff_tpu.engine.trainer import main as train_main

from helpers import build_collection, build_w2v


@pytest.fixture
def task3_world(tmp_path):
    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=24, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=12, caps_per_video=1, seed=5)
    build_w2v(root)
    # negation caption set: ids '<cap>F<k>p' (positive) / 'Fn' (negative)
    cap_path = os.path.join(root, "toytrain", "TextData", "toytrain.caption.txt")
    neg_lines = []
    with open(cap_path) as fh:
        for i, line in enumerate(fh):
            cap_id, caption = line.strip().split(" ", 1)
            if i % 3 == 0:
                neg_lines.append(f"{cap_id}Fp the dog does not run")
            elif i % 3 == 1:
                neg_lines.append(f"{cap_id}Fn nothing here at all")
    with open(
        os.path.join(root, "toytrain", "TextData", "toytrain.caption.false.txt"), "w"
    ) as fh:
        fh.write("\n".join(neg_lines))
    return root


def test_task3_training_runs_and_learns(task3_world):
    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=task3_world,
        val_set="no", config_name="tiny", num_epochs=16, batch_size=12,
        model_prefix="run_t3", metric="mir", task3_caption="false",
    )
    result = train_main(opt)
    # above the random-baseline mir (~H(12)/12 = 0.26) after training
    # (16 epochs: the torch-matched initializers learn slower than flax
    # defaults on this 24-video world — 0.23@6ep vs 0.30@16ep)
    assert result["best_perf"] > 0.26, result
    assert os.path.exists(os.path.join(result["model_path"], "model_best.pth.tar"))


def test_device_caches_under_task3(task3_world):
    """task3 substitutes negation-augmented CAPTIONS per epoch, so a
    once-built HBM text cache would silently train on stale rows —
    forcing --device_text_cache 1 must fail loudly. The VISUAL rows are
    static per video, so the vis cache stays legal under task3 and must
    reproduce the fed path exactly."""
    base = dict(
        trainCollection="toytrain", valCollection="toyval",
        rootpath=task3_world, val_set="no", config_name="tiny",
        num_epochs=2, batch_size=12, task3_caption="false",
    )
    with pytest.raises(ValueError, match="incompatible"):
        train_main(Options(model_prefix="t3_txtcache",
                           device_text_cache=1, **base))
    fed = train_main(Options(model_prefix="t3_fed", device_feature_cache=0,
                             device_text_cache=0, steps_per_dispatch=1,
                             **base))
    cached = train_main(Options(model_prefix="t3_viscache",
                                device_feature_cache=1, **base))
    np.testing.assert_allclose(
        [e["loss"] for e in cached["history"]],
        [e["loss"] for e in fed["history"]], rtol=1e-5,
    )


def test_task3_feed_batches(task3_world):
    from laff_tpu.engine import prepare

    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=task3_world,
        val_set="no", config_name="tiny", batch_size=8, task3_caption="false",
    )
    prepared = prepare(opt)
    assert prepared.spec.task3 is not None
    batch = next(iter(prepared.train_feed.epoch(0)))
    assert "false_txt" in batch and "task3_mask" in batch
    mask = batch["task3_mask"]
    assert set(np.unique(mask)) <= {-1, 0, 1}
    assert batch["false_txt"]["bow"].shape == batch["txt"]["bow"].shape
    # rows without a negation entry must carry empty false captions
    empty_rows = mask == -1
    if empty_rows.any():
        np.testing.assert_allclose(
            batch["false_txt"]["bow"][empty_rows], 0.0
        )


def test_split_negation():
    from laff_tpu.text.textlib import split_negation

    pos, neg, has = split_negation("a man not wearing a hat")
    assert (pos, neg, has) == ("a man", "wearing a hat", True)
    pos, neg, has = split_negation("a dog runs")
    assert has is False and pos == "a dog runs"
    pos, neg, has = split_negation("people without masks walking")
    assert has and neg.startswith("masks")


def test_negation_adjusted_scores(rng):
    import numpy as np

    from laff_tpu.engine.predictor import negation_adjusted_scores

    scores = rng.uniform(-1, 1, (3, 5)).astype(np.float32)
    neg_scores = rng.uniform(-1, 1, (3, 5)).astype(np.float32)
    mask = np.array([1.0, 0.0, 1.0], np.float32)
    out = negation_adjusted_scores(scores, neg_scores, mask)
    # non-negated rows: uniform -0.5 shift (rank preserving)
    np.testing.assert_allclose(out[1], (scores[1] + 1) / 2 - 0.5, rtol=1e-6)
    # negated rows: penalized by the negated-clause similarity
    expected0 = (scores[0] + 1) / 2 - (np.clip(neg_scores[0], 0, None) + 1) / 2
    np.testing.assert_allclose(out[0], expected0, rtol=1e-6)
    out_mul = negation_adjusted_scores(scores, neg_scores, mask, method="mul")
    assert out_mul.shape == scores.shape


def test_negation_inert_warning_with_precomputed_only_text(tmp_path, caplog):
    """With precomputed-only text configs the synthesized clauses reuse the
    query's own feature rows (no clause signal): embed_negation_split must
    warn LOUDLY and the pos/neg embeddings must be identical (the inert
    deviation documented vs reference data_provider.py:517-518)."""
    import logging

    import jax.numpy as jnp

    from laff_tpu.data.feed import EvalFeed, TextBatcher
    from laff_tpu.engine.predictor import embed_negation_split

    cap_path = tmp_path / "caps.txt"
    cap_path.write_text(
        "video1#0 a man not wearing a hat\nvideo2#0 a dog runs\n"
    )

    rng = np.random.default_rng(0)
    rows = {f"video{i}#0": rng.normal(size=8).astype(np.float32)
            for i in (1, 2)}

    class FakeBigFile:
        def gather(self, cap_ids):
            return list(cap_ids), np.stack([rows[c] for c in cap_ids])

    from laff_tpu.data.sources import TextSource

    tsrc = TextSource(str(cap_path), precomputed={"CLIP_encoding": FakeBigFile()})
    batcher = TextBatcher(tsrc, featurizers={"clip": None})
    txt_ids = tsrc.cap_ids
    feed = EvalFeed(txt_ids, batcher, batch_size=2)

    class FakeEmbedder:
        def embed_txt(self, f):
            chunks, ids = [], []
            for item in f:
                chunks.append(item["data"]["clip"][: item["valid"]])
                ids.extend(item["ids"])
            return jnp.asarray(np.concatenate(chunks)), ids

    import laff_tpu.engine.predictor as P

    P.logger.addHandler(caplog.handler)  # laff_tpu loggers don't propagate
    try:
        with caplog.at_level(logging.WARNING):
            pos, neg, mask = embed_negation_split(
                FakeEmbedder(), feed, tsrc, txt_ids)
    finally:
        P.logger.removeHandler(caplog.handler)
    assert mask.tolist() == [1.0, 0.0]
    assert any("NEGATION SCORING IS INERT" in r.message for r in caplog.records)
    # no live modality: both clauses gather the same query rows
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(neg))


def test_negation_not_inert_with_live_text(tmp_path, caplog):
    """A live modality (bow) suppresses the inert warning."""
    import logging

    import jax.numpy as jnp

    from laff_tpu.data.feed import EvalFeed, TextBatcher
    from laff_tpu.data.sources import TextSource
    from laff_tpu.engine.predictor import embed_negation_split
    from laff_tpu.text.txt2vec import BowVec
    from laff_tpu.text.vocab import build_vocab

    cap_path = tmp_path / "caps.txt"
    cap_path.write_text(
        "video1#0 a man not wearing a hat\nvideo2#0 a dog runs\n"
    )
    vocab, _ = build_vocab(str(cap_path), "bow", threshold=1)
    tsrc = TextSource(str(cap_path))
    batcher = TextBatcher(tsrc, featurizers={"bow": BowVec(vocab)})
    txt_ids = tsrc.cap_ids
    feed = EvalFeed(txt_ids, batcher, batch_size=2)

    class FakeEmbedder:
        def embed_txt(self, f):
            chunks, ids = [], []
            for item in f:
                chunks.append(item["data"]["bow"][: item["valid"]])
                ids.extend(item["ids"])
            return jnp.asarray(np.concatenate(chunks)), ids

    import laff_tpu.engine.predictor as P

    P.logger.addHandler(caplog.handler)
    try:
        with caplog.at_level(logging.WARNING):
            pos, neg, mask = embed_negation_split(
                FakeEmbedder(), feed, tsrc, txt_ids)
    finally:
        P.logger.removeHandler(caplog.handler)
    assert not any("INERT" in r.message for r in caplog.records)
    # live bow encodes the clauses distinctly
    assert not np.array_equal(np.asarray(pos), np.asarray(neg))


def test_task3_negation_subset_validation(task3_world):
    """Per-epoch re-evaluation on the negation caption subset (reference
    trainer.py:596-607): 'task3'-prefixed metrics exist in the scalar log
    and the run history, and the stream moves across epochs."""
    root = task3_world
    # negation validation subset: every third val caption id
    val_cap = os.path.join(root, "toyval", "TextData", "toyval.caption.txt")
    with open(val_cap) as fh:
        cap_ids = [line.split(" ", 1)[0] for line in fh if line.strip()]
    subset = cap_ids[::3]
    with open(os.path.join(root, "toyval", "TextData",
                           "toyval.caption.negationset.txt"), "w") as fh:
        fh.write("\n".join(f"{c} some negated caption" for c in subset))

    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=6, batch_size=12,
        model_prefix="run_t3_negval", metric="mir", task3_caption="false",
    )
    result = train_main(opt)

    hist = result["history"]
    assert all("task3_mir" in e for e in hist), hist[0].keys()
    t3_mirs = [e["task3_mir"] for e in hist]
    assert all(np.isfinite(v) for v in t3_mirs)
    assert len(set(round(v, 6) for v in t3_mirs)) > 1, "task3 stream frozen"
    # the subset stream is its own signal, not a copy of the full metric
    assert any(abs(e["task3_mir"] - e["mir"]) > 1e-9 for e in hist)

    scalars = os.path.join(result["model_path"], "scalars.tsv")
    with open(scalars) as fh:
        tags = {line.split("\t")[1] for line in fh if "\t" in line}
    assert "task3val/mir" in tags and "task3val/r1" in tags, tags


def test_task3_negationset_missing_is_skipped(task3_world, caplog):
    """task3 without the negationset file trains normally and logs a
    warning instead of crashing (the file is an optional TRECVid asset)."""
    opt = Options(
        trainCollection="toytrain", valCollection="toyval",
        rootpath=task3_world, val_set="no", config_name="tiny",
        num_epochs=2, batch_size=12, model_prefix="run_t3_nofile",
        metric="mir", task3_caption="false",
    )
    result = train_main(opt)
    assert "task3_mir" not in result["history"][0]
