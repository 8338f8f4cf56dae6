"""Build flagship-dimension rehearsal worlds used for on-chip timing.

Two scales:

* ``timing`` (default, unchanged): 2000 train videos x 20 captions, 500
  val videos, the four real feature dims (clip 512 / timesformer 768 /
  x3d 2048 / ircsn 2048), a 3000-word vocabulary, and a word2vec table
  at the reference's hard-coded path.
* ``msrvtt``: the full MSR-VTT training shape for the MEASURED 80-epoch
  wall-clock headline (VERDICT r4 item 3) — 10,020 train videos x 13
  captions = 130,260 captions (matching msrvtt10ktrain,
  /root/reference/shell/README.MD), 497 val videos x 20 captions =
  9,940 val captions (msrvtt10kval), an ~11.3k-word vocabulary so the
  BoW tower matches the flagship's 11,286-dim input, and per-caption
  512-d synthetic CLIP text features in TextData/clip_synth (the
  headline config consumes precomputed CLIP rows, reference
  data_provider.py:565-574).

Usage: python shell/make_rehearsal_world.py [rootpath] [--scale msrvtt]
Then:  python do_trainer.py rtrain rval --rootpath <rootpath> \
           --config_name rehearsal --num_epochs ...
"""
import argparse
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from laff_tpu.store import write_bigfile

FEATS = {"clip_ft": 512, "timesformer": 768, "x3d": 2048, "ircsn": 2048}
LATENT = 24


def build(root, coll, n_videos, caps, seed, vocab, word_codes,
          clip_text=False):
    rng = np.random.default_rng(seed)
    vids = [f"{coll}_v{i}" for i in range(n_videos)]
    n_words = len(vocab)
    words_per_video = [rng.choice(n_words, size=8, replace=False)
                       for _ in vids]
    latent = np.stack([word_codes[w].sum(0) for w in words_per_video])
    for feat, dim in FEATS.items():
        # zlib.crc32: stable across processes (str hash is salted), so
        # worlds built in separate runs share one feature space
        proj = np.random.default_rng(
            zlib.crc32(feat.encode()) % 1000
        ).standard_normal((LATENT, dim)).astype(np.float32) * 0.3
        mat = latent @ proj + 0.1 * rng.standard_normal(
            (n_videos, dim)).astype(np.float32)
        write_bigfile(os.path.join(root, coll, "FeatureData", feat), vids, mat)
    os.makedirs(os.path.join(root, coll, "TextData"), exist_ok=True)
    lines = []
    cap_ids = []
    cap_word_sets = []
    for i, vid in enumerate(vids):
        base = [vocab[j] for j in words_per_video[i]]
        for c in range(caps):
            sel = rng.permutation(8)[:6]
            cap_ids.append(f"{vid}#{c}")
            cap_word_sets.append(words_per_video[i][sel])
            lines.append(f"{vid}#{c} the {' '.join(base[j] for j in sel)}")
    open(os.path.join(root, coll, "TextData", f"{coll}.caption.txt"),
         "w").write("\n".join(lines))
    os.makedirs(os.path.join(root, coll, "VideoSets"), exist_ok=True)
    open(os.path.join(root, coll, "VideoSets", f"{coll}.txt"),
         "w").write("\n".join(vids))
    if clip_text:
        # per-caption clip rows from the caption's own 6-word latent, so
        # the clip modality carries retrieval signal like the real dumps
        proj = np.random.default_rng(
            zlib.crc32(b"clip_text") % 1000
        ).standard_normal((LATENT, 512)).astype(np.float32) * 0.3
        cap_latent = np.stack([word_codes[w].sum(0) for w in cap_word_sets])
        rows = cap_latent @ proj + 0.1 * rng.standard_normal(
            (len(cap_ids), 512)).astype(np.float32)
        write_bigfile(os.path.join(root, coll, "TextData", "clip_synth"),
                      cap_ids, rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rootpath", nargs="?", default="/tmp/rehearsal")
    ap.add_argument("--scale", choices=("timing", "msrvtt"),
                    default="timing")
    args = ap.parse_args()
    root = args.rootpath

    if args.scale == "timing":
        n_vocab, train_videos, train_caps = 3000, 2000, 20
        val_videos, val_caps = 500, 1
        clip_text = False
    else:
        n_vocab, train_videos, train_caps = 11286, 10020, 13
        val_videos, val_caps = 497, 20
        clip_text = True
    vocab = [f"w{i:05d}" for i in range(n_vocab)]
    word_codes = np.random.default_rng(99).standard_normal(
        (n_vocab, LATENT)).astype(np.float32)

    build(root, "rtrain", train_videos, train_caps, 0, vocab, word_codes,
          clip_text=clip_text)
    build(root, "rval", val_videos, val_caps, 7, vocab, word_codes,
          clip_text=clip_text)
    # synthetic 500-d w2v covering the vocab
    w2v = np.random.default_rng(5).standard_normal(
        (n_vocab + 2, 500)).astype(np.float32)
    write_bigfile(os.path.join(root, "word2vec", "synth500"),
                  vocab + ["the", "a"], w2v)
    print("rehearsal world ready:", root, f"(scale={args.scale})")


if __name__ == "__main__":
    main()
