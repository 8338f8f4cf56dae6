"""Tokenizer / vocabulary / featurizer exact-value tests."""

import numpy as np

from laff_tpu.store import write_bigfile
from laff_tpu.text import (
    BowVec,
    BowVecNSW,
    IndexVec,
    TextTool,
    Vocabulary,
    W2Vec,
    build_vocab,
    negation_augmentation,
)


def test_tokenize_basic():
    assert TextTool.tokenize("a Dog??? is running") == ["a", "dog", "is", "running"]
    assert TextTool.tokenize("The dog runs") == ["the", "dog", "runs"]
    assert TextTool.tokenize("dogs-x runs") == ["dogs", "x", "runs"]


def test_tokenize_stopwords():
    toks = TextTool.tokenize("a dog is running", remove_stopword=True)
    assert toks == ["dog", "running"]


def test_negation_augmentation():
    out = negation_augmentation("the dog doesn't run")
    assert "the dog does not run" in out
    out2 = negation_augmentation("the dog does not run")
    assert any("doesn" in x for x in out2[1:])


def test_vocabulary_unk():
    v = Vocabulary("gru")
    for t in ("<pad>", "<start>", "<end>", "<unk>", "dog"):
        v.add(t)
    assert v("dog") == 4
    assert v("zebra") == 3  # maps to <unk> for gru vocabs
    assert v.find("zebra") == -1
    assert len(v) == 5


def test_build_vocab(tmp_path):
    cap = tmp_path / "caps.txt"
    cap.write_text(
        "vid1#0 a dog runs fast\n"
        "vid1#1 a dog jumps\n"
        "vid2#0 a cat sits and a dog barks\n"
        "vid3#0 dog dog dog\n"
    )
    vocab, counts = build_vocab(str(cap), "bow", threshold=3)
    assert vocab.find("dog") == 0  # most frequent first
    assert vocab.find("cat") == -1  # below threshold
    gru_vocab, _ = build_vocab(str(cap), "gru", threshold=3)
    assert gru_vocab.find("<pad>") == 0
    assert gru_vocab.find("dog") == 4


def _tiny_vocab():
    v = Vocabulary("bow")
    for w in ("dog", "runs", "cat"):
        v.add(w)
    return v


def test_bow_encoding():
    t2v = BowVec(_tiny_vocab())
    vec = t2v.encoding("a dog runs and the dog sits")
    np.testing.assert_allclose(vec, [2.0, 1.0, 0.0])


def test_bow_nsw_removes_stopwords():
    v = Vocabulary("bow_nsw")
    v.add("a")
    v.add("dog")
    t2v = BowVecNSW(v)
    vec = t2v.encoding("a dog")
    np.testing.assert_allclose(vec, [0.0, 1.0])  # 'a' is a stopword


def test_w2v_mean_pool(tmp_path):
    d = str(tmp_path / "w2v")
    write_bigfile(d, ["dog", "cat"], np.array([[1.0, 2.0], [3.0, 4.0]], np.float32))
    t2v = W2Vec(d)
    np.testing.assert_allclose(t2v.encoding("dog cat"), [2.0, 3.0])
    np.testing.assert_allclose(t2v.encoding("zebra"), [0.0, 0.0])
    raw = t2v.raw_encoding("dog cat")
    assert raw.shape == (2, 2)


def test_indexvec():
    v = Vocabulary("gru")
    for t in ("<pad>", "<start>", "<end>", "<unk>", "dog", "runs"):
        v.add(t)
    t2v = IndexVec(v)
    np.testing.assert_array_equal(t2v.encoding("dog runs"), [1, 4, 5, 2])
    np.testing.assert_array_equal(t2v.encoding("zebra"), [1, 3, 2])
    ids, lengths = t2v.encode_batch_padded(["dog runs", "dog"], max_len=6)
    assert ids.shape == (2, 6)
    np.testing.assert_array_equal(lengths, [4, 3])
    np.testing.assert_array_equal(ids[1], [1, 4, 2, 0, 0, 0])
