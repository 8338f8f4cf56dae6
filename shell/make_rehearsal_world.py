"""Build the flagship-dimension rehearsal world used for on-chip timing:
2000 train videos x 20 captions, 500 val videos, the four real feature
dims (clip 512 / timesformer 768 / x3d 2048 / ircsn 2048), a 3000-word
vocabulary, and a word2vec table at the reference's hard-coded path.

Usage: python shell/make_rehearsal_world.py [rootpath]   (default /tmp/rehearsal)
Then:  python do_trainer.py rtrain rval --rootpath <rootpath> \
           --config_name rehearsal --num_epochs ... (configs/rehearsal*.py)
"""
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from laff_tpu.store import write_bigfile

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rehearsal"
VOCAB = [f"w{i:04d}" for i in range(3000)]
WORD_CODES = np.random.default_rng(99).standard_normal((3000, 24)).astype(np.float32)
FEATS = {"clip_ft": 512, "timesformer": 768, "x3d": 2048, "ircsn": 2048}

def build(coll, n_videos, caps, seed):
    rng = np.random.default_rng(seed)
    vids = [f"{coll}_v{i}" for i in range(n_videos)]
    words_per_video = [rng.choice(3000, size=8, replace=False) for _ in vids]
    latent = np.stack([WORD_CODES[w].sum(0) for w in words_per_video])
    for feat, dim in FEATS.items():
        # zlib.crc32: stable across processes (str hash is salted), so
        # worlds built in separate runs share one feature space
        proj = np.random.default_rng(zlib.crc32(feat.encode()) % 1000).standard_normal((24, dim)).astype(np.float32) * 0.3
        mat = latent @ proj + 0.1 * rng.standard_normal((n_videos, dim)).astype(np.float32)
        write_bigfile(os.path.join(ROOT, coll, "FeatureData", feat), vids, mat)
    os.makedirs(os.path.join(ROOT, coll, "TextData"), exist_ok=True)
    lines = []
    for i, vid in enumerate(vids):
        base = [VOCAB[j] for j in words_per_video[i]]
        for c in range(caps):
            sel = rng.permutation(8)[:6]
            lines.append(f"{vid}#{c} the {' '.join(base[j] for j in sel)}")
    open(os.path.join(ROOT, coll, "TextData", f"{coll}.caption.txt"), "w").write("\n".join(lines))
    os.makedirs(os.path.join(ROOT, coll, "VideoSets"), exist_ok=True)
    open(os.path.join(ROOT, coll, "VideoSets", f"{coll}.txt"), "w").write("\n".join(vids))

build("rtrain", 2000, 20, 0)
build("rval", 500, 1, 7)
# synthetic 500-d w2v covering the vocab
w2v = np.random.default_rng(5).standard_normal((3002, 500)).astype(np.float32)
write_bigfile(os.path.join(ROOT, "word2vec", "synth500"), VOCAB + ["the", "a"], w2v)
print("rehearsal world ready:", ROOT)
