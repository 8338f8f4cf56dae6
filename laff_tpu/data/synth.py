"""Synthetic-collection builder (tiny, learnable retrieval worlds).

Builds an on-disk collection in the reference layout
(ref: data_provider.py:380-698 consumes the same directory shapes):
  <root>/<collection>/FeatureData/<feat>/...
  <root>/<collection>/TextData/<collection>.caption.txt
  <root>/<collection>/VideoSets/<collection>.txt
plus a toy word2vec BigFile. Captions are generated so that caption i is
latently aligned with video i (shared low-dim code), making retrieval
learnable in a few steps. Used by the test suite, the multichip dryrun,
and the rehearsal-world benchmark builder.
"""

import os
import zlib

import numpy as np

from laff_tpu.store import write_bigfile

WORDS = [
    "dog", "cat", "man", "woman", "car", "ball", "runs", "jumps", "sits",
    "eats", "red", "blue", "big", "small", "park", "road", "water", "table",
]


def make_word_pool(n: int):
    """Deterministic word pool of size n: WORDS first, then synthetic
    pseudo-words (``wordNN``). Larger equivalence worlds need more
    distinct words than the 18 stock ones so hundreds of videos don't
    collapse onto near-duplicate latent codes."""
    if n <= len(WORDS):
        return WORDS[:n]
    return WORDS + [f"word{i:03d}" for i in range(n - len(WORDS))]


def build_collection(
    root: str,
    collection: str,
    n_videos: int = 24,
    caps_per_video: int = 2,
    feat_dims=(("clip_ft", 16), ("x3d", 12)),
    latent_dim: int = 5,
    seed: int = 0,
    frame_feat: bool = False,
    max_frames: int = 6,
    word_pool=None,
    noise: float = 0.05,
):
    rng = np.random.default_rng(seed)
    cdir = os.path.join(root, collection)
    vids = [f"video{i}" for i in range(n_videos)]
    words = list(word_pool) if word_pool is not None else WORDS

    # each video gets 4 distinct words; its latent code is the sum of fixed
    # per-word vectors, so BoW text linearly predicts the video features
    word_codes = np.random.default_rng(99).standard_normal(
        (len(words), latent_dim)
    ).astype(np.float32)
    video_words = [
        sorted(rng.choice(len(words), size=4, replace=False)) for _ in vids
    ]
    latent = np.stack([word_codes[w].sum(0) for w in video_words])

    for feat, dim in feat_dims:
        # zlib.crc32: stable across processes (str hash is salted)
        proj = np.random.default_rng(zlib.crc32(feat.encode()) % 2**31).standard_normal(
            (latent_dim, dim)
        ).astype(np.float32)
        mat = latent @ proj + noise * rng.standard_normal((n_videos, dim)).astype(
            np.float32
        )
        write_bigfile(os.path.join(cdir, "FeatureData", feat), vids, mat)

    if frame_feat:
        fname = "clip_frames"
        dim = dict(feat_dims)["clip_ft"]
        proj = np.random.default_rng(1234).standard_normal((latent_dim, dim)).astype(
            np.float32
        )
        frame_ids, frame_rows = [], []
        for i, vid in enumerate(vids):
            t = int(rng.integers(2, max_frames + 1))
            for f in range(t):
                frame_ids.append(f"{vid}_{f}")
                frame_rows.append(
                    latent[i] @ proj + 0.1 * rng.standard_normal(dim).astype(np.float32)
                )
        # both layouts: flat (direct VisionSource tests) and the
        # FeatureData/frame/<name> location that prepare() reads
        rows = np.stack(frame_rows)
        write_bigfile(os.path.join(cdir, "FeatureData", fname), frame_ids, rows)
        write_bigfile(
            os.path.join(cdir, "FeatureData", "frame", fname), frame_ids, rows
        )

    os.makedirs(os.path.join(cdir, "TextData"), exist_ok=True)
    cap_lines = []
    for i, vid in enumerate(vids):
        base_words = [words[j] for j in video_words[i]]
        for c in range(caps_per_video):
            order = rng.permutation(len(base_words))
            shuffled = [base_words[j] for j in order]
            cap_lines.append(f"{vid}#{c} the {' '.join(shuffled)}")
    with open(os.path.join(cdir, "TextData", f"{collection}.caption.txt"), "w") as fh:
        fh.write("\n".join(cap_lines))

    os.makedirs(os.path.join(cdir, "VideoSets"), exist_ok=True)
    with open(os.path.join(cdir, "VideoSets", f"{collection}.txt"), "w") as fh:
        fh.write("\n".join(vids))

    return cdir, vids, cap_lines


def build_w2v(root: str, dim: int = 8, seed: int = 3, word_pool=None) -> str:
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "word2vec", "toy")
    vocab = (list(word_pool) if word_pool is not None else WORDS) + ["the", "a"]
    write_bigfile(d, vocab, rng.standard_normal((len(vocab), dim)).astype(np.float32))
    return d
