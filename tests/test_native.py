"""Native fastfeat extension: builds, matches the Python featurizers
exactly, and is actually faster."""

import time

import numpy as np
import pytest

from laff_tpu.native import get_fastfeat
from laff_tpu.text import BowVecNSW, BowVec, IndexVec, Vocabulary

pytestmark = pytest.mark.skipif(
    get_fastfeat() is None, reason="no C++ compiler available"
)

CAPTIONS = [
    "a dog runs on the grass",
    "the CAT!!! sits, quietly...",
    "",
    "dog dog dog and a zebra42",
    "café people walking",  # multi-byte utf-8
]


def make_vocabs():
    bow = Vocabulary("bow_nsw")
    for w in ("dog", "runs", "grass", "cat", "sits", "quietly", "people",
              "walking", "caf", "zebra42"):
        bow.add(w)
    gru = Vocabulary("gru")
    for w in ("<pad>", "<start>", "<end>", "<unk>", "dog", "runs", "the",
              "a", "cat", "grass"):
        gru.add(w)
    return bow, gru


def test_bow_matches_python():
    bow_vocab, _ = make_vocabs()
    fast = BowVecNSW(bow_vocab)
    out_fast = fast.encode_batch(CAPTIONS)
    # force the Python path via the parent implementation
    out_py = np.stack([fast.encoding(c) for c in CAPTIONS]).astype(np.float32)
    np.testing.assert_array_equal(out_fast, out_py)

    with_sw = BowVec(bow_vocab)
    np.testing.assert_array_equal(
        with_sw.encode_batch(CAPTIONS),
        np.stack([with_sw.encoding(c) for c in CAPTIONS]).astype(np.float32),
    )


def test_idx_matches_python():
    _, gru_vocab = make_vocabs()
    iv = IndexVec(gru_vocab)
    ids_fast, len_fast = iv.encode_batch_padded(CAPTIONS, max_len=10)
    ids_py = np.zeros((len(CAPTIONS), 10), np.int32)
    len_py = np.zeros((len(CAPTIONS),), np.int32)
    for i, c in enumerate(CAPTIONS):
        seq = iv.encoding(c)[:10]
        ids_py[i, : len(seq)] = seq
        len_py[i] = len(seq)
    np.testing.assert_array_equal(ids_fast, ids_py)
    np.testing.assert_array_equal(len_fast, len_py)


def test_fastfeat_speedup():
    bow_vocab, _ = make_vocabs()
    fast = BowVecNSW(bow_vocab)
    captions = CAPTIONS * 2000  # 10k captions
    t0 = time.perf_counter()
    fast.encode_batch(captions)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    for c in captions[:1000]:
        fast.encoding(c)
    t_py = (time.perf_counter() - t0) * 10  # extrapolate to 10k
    assert t_fast < t_py, (t_fast, t_py)


def test_w2v_batched_matches_per_caption(tmp_path):
    import numpy as np

    from laff_tpu.store import write_bigfile
    from laff_tpu.text import W2VecNSW

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(50)]
    d = str(tmp_path / "w2v")
    write_bigfile(d, words, rng.standard_normal((50, 8)).astype(np.float32))
    t2v = W2VecNSW(d)
    caps = ["w1 w2 w3", "", "w49 unknown w0", "w5 w5 w5"]
    batched = t2v.encode_batch(caps)
    per = np.stack([t2v.encoding(c) for c in caps]).astype(np.float32)
    np.testing.assert_allclose(batched, per, rtol=1e-5, atol=1e-6)
