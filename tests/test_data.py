"""Data pipeline: sources, fixed-shape batchers, prefetch feed."""

import os

import numpy as np
import pytest

from laff_tpu.data import (
    EvalFeed,
    PairFeed,
    Prefetcher,
    TextBatcher,
    TextSource,
    VisBatcher,
    VisionSource,
    read_video_set,
    vis_id_of,
)
from laff_tpu.store import BigFile
from laff_tpu.text import BowVecNSW, IndexVec, W2VecNSW, build_vocab

from helpers import build_collection, build_w2v


@pytest.fixture
def collection(tmp_path):
    root = str(tmp_path)
    cdir, vids, caps = build_collection(root, "toy", frame_feat=True)
    w2v_dir = build_w2v(root)
    return root, cdir, vids, caps, w2v_dir


def make_batchers(cdir, vids, w2v_dir, with_frames=False):
    capfile = os.path.join(cdir, "TextData", "toy.caption.txt")
    bow_vocab, _ = build_vocab(capfile, "bow_nsw", threshold=1)
    gru_vocab, _ = build_vocab(capfile, "gru", threshold=1)
    tsrc = TextSource(capfile)
    tb = TextBatcher(
        tsrc,
        {
            "bow": BowVecNSW(bow_vocab),
            "w2v": W2VecNSW(w2v_dir),
            "rnn": IndexVec(gru_vocab),
        },
        max_txtlength=12,
    )
    feats = {
        "clip_ft": BigFile(os.path.join(cdir, "FeatureData", "clip_ft")),
        "x3d": BigFile(os.path.join(cdir, "FeatureData", "x3d")),
    }
    frame_feats = (
        {"clip_frames": BigFile(os.path.join(cdir, "FeatureData", "clip_frames"))}
        if with_frames
        else None
    )
    vsrc = VisionSource(feats, vids, frame_feat_files=frame_feats, max_frame=6)
    vb = VisBatcher(vsrc, with_frames=with_frames)
    return tb, vb, tsrc, vsrc


def test_vision_source_gather(collection):
    root, cdir, vids, caps, w2v_dir = collection
    _, vb, _, vsrc = make_batchers(cdir, vids, w2v_dir)
    out = vb(["video3", "video0"])
    assert out["clip_ft"].shape == (2, 16)
    assert out["x3d"].shape == (2, 12)
    bf = BigFile(os.path.join(cdir, "FeatureData", "clip_ft"))
    np.testing.assert_allclose(out["clip_ft"][0], bf.read_one("video3"), rtol=1e-6)


def test_frame_gather_padding(collection):
    root, cdir, vids, caps, w2v_dir = collection
    _, vb, _, vsrc = make_batchers(cdir, vids, w2v_dir, with_frames=True)
    out = vb(["video0", "video1"])
    frames = out["clip_frames@frames"]
    mask = out["clip_frames@mask"]
    assert frames.shape == (2, 6, 16)
    assert mask.shape == (2, 6)
    # mask counts equal real frame counts; padded rows are zero
    counts = mask.sum(1).astype(int)
    for i in range(2):
        assert counts[i] >= 2
        np.testing.assert_allclose(frames[i, counts[i]:], 0.0)


def test_text_batcher_shapes(collection):
    root, cdir, vids, caps, w2v_dir = collection
    tb, _, tsrc, _ = make_batchers(cdir, vids, w2v_dir)
    cap_ids = tsrc.cap_ids[:5]
    out = tb(cap_ids)
    assert out["bow"].shape[0] == 5
    assert out["w2v"].shape == (5, 8)
    assert out["rnn_ids"].shape == (5, 12)
    assert (out["rnn_len"] > 0).all()


def test_pair_feed_fixed_shapes_and_alignment(collection):
    root, cdir, vids, caps, w2v_dir = collection
    tb, vb, tsrc, _ = make_batchers(cdir, vids, w2v_dir)
    feed = PairFeed(tb, vb, batch_size=16, seed=1)
    batches = list(feed.epoch(0))
    assert len(batches) == feed.steps_per_epoch() == len(tsrc) // 16
    for b in batches:
        assert b["txt"]["bow"].shape[0] == 16
        assert b["vis"]["clip_ft"].shape[0] == 16
        for cap_id, vis_id in zip(b["cap_ids"], b["vis_ids"]):
            assert vis_id_of(cap_id) == vis_id

    # different epochs shuffle differently, same epoch reproducible
    order0 = [c for b in feed.epoch(0) for c in b["cap_ids"]]
    order0b = [c for b in feed.epoch(0) for c in b["cap_ids"]]
    order1 = [c for b in feed.epoch(1) for c in b["cap_ids"]]
    assert order0 == order0b
    assert order0 != order1


def test_eval_feed_pads_final_batch(collection):
    root, cdir, vids, caps, w2v_dir = collection
    _, vb, _, _ = make_batchers(cdir, vids, w2v_dir)
    feed = EvalFeed(vids, vb, batch_size=10)
    batches = list(feed)
    assert len(batches) == 3  # 24 videos / 10
    assert batches[-1]["valid"] == 4
    assert batches[-1]["data"]["clip_ft"].shape == (10, 16)
    assert len(batches[-1]["ids"]) == 4


def test_prefetcher_order_and_error_propagation():
    items = list(range(7))
    out = list(Prefetcher(iter(items), depth=2))
    assert out == items

    def boom():
        yield 1
        raise RuntimeError("io failed")

    pf = Prefetcher(boom(), depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="io failed"):
        next(pf)


def test_task3_text_source(tmp_path):
    capfile = str(tmp_path / "neg.caption.txt")
    # ids carry an 'F<variant>' tail plus p/n polarity; everything from 'F'
    # is stripped from the caption key (reference data_provider.py:536-543)
    with open(capfile, "w") as fh:
        fh.write(
            "video1#0Fp a dog is running\n"
            "video1#0F2p a dog sprints\n"
            "video2#0Fn no person here\n"
        )
    src = TextSource(capfile, task3=True, shuffle_seed=0)
    assert src.mask_task3["video1#0"] == 1
    assert src.mask_task3["video2#0"] == 0
    import random as _r

    cap, mask = src.false_caption("video1#0", _r.Random(0))
    assert mask == 1 and cap is not None
    cap, mask = src.false_caption("missing#0", _r.Random(0))
    assert mask == -1 and cap is None


def test_read_video_set(collection):
    root, cdir, vids, caps, w2v_dir = collection
    got = read_video_set(os.path.join(cdir, "VideoSets", "toy.txt"))
    assert got == vids


def test_setup_dataset_layout(tmp_path):
    """data/setup_dataset.py unpacks an archive and symlinks the split
    dirs onto the base collection (reference data/do_msrvtt.sh:1-18)."""
    import subprocess
    import sys
    import zipfile

    root = str(tmp_path / "VisualSearch")
    # build a fake release zip: base collection with the four dirs
    base = tmp_path / "stage" / "msvd"
    for sub in ("FeatureData", "FrameFeatureData", "TextData", "VideoSets"):
        (base / sub).mkdir(parents=True)
        (base / sub / "marker.txt").write_text(sub)
    zpath = str(tmp_path / "msvd.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _, files in os.walk(base.parent):
            for f in files:
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, base.parent))

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "setup_dataset.py")
    out = subprocess.run(
        [sys.executable, script, "msvd", "--rootpath", root, "--zip", zpath],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr[-500:]
    for split in ("msvdtrain", "msvdval", "msvdtest"):
        for sub in ("FeatureData", "TextData", "VideoSets"):
            marker = os.path.join(root, split, sub, "marker.txt")
            assert os.path.exists(marker), marker
    # frame features reachable at the loader's FeatureData/frame path
    assert os.path.exists(os.path.join(
        root, "msvdtrain", "FeatureData", "frame", "marker.txt"))
    # idempotent rerun
    out2 = subprocess.run(
        [sys.executable, script, "msvd", "--rootpath", root],
        capture_output=True, text=True, timeout=60,
    )
    assert out2.returncode == 0, out2.stderr[-500:]
