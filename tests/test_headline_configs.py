"""The published headline configurations run end to end: the LAFF config
(parm 0_12_0_12_0_0_1) and the LAFF-ml / FrameLAFF config
(FrameLaff_NoFrameFc_StrongCLIP_adjust, parm 0_7_1_12_0_12_0) over a
synthetic world using the REAL feature-directory names and dims."""

import os

import numpy as np
import pytest

from laff_tpu.engine import Options, prepare
from laff_tpu.engine.trainer import main as train_main
from laff_tpu.store import write_bigfile

# real reference feature names + dims (README.md:38, configs)
LAFF_VID_FEATS = {
    "clip_finetune_8frame_uniform_1103": 512,
    "HowTo100M_TimeSformer_divST_96x4_224": 768,
    "X3D_L": 2048,
    "mean_irCSN_152_ig65m_from_scratch": 2048,
}
FRAMELAFF_VID_FEATS = {
    "mean_C3d_resneXt101_16f": 2048,
    "HowTo100M_TimeSformer_divST_96x4_224": 768,
    "X3D_L": 2048,
    "mean_irCSN_152_ig65m_from_scratch": 2048,
}
FRAME_FEAT = ("Frame_clip_finetune_8frame_uniform_1103", 512)
CLIP_TEXT_DIR = "clip_finetune_8frame_uniform_1103"

# small vocabulary so every word clears the threshold-5 vocab cut
WORDS = [f"tok{i:03d}" for i in range(30)]


def build_world(root, coll, n_videos, caps, seed, feats, with_frames=False,
                with_clip_text=True):
    rng = np.random.default_rng(seed)
    vids = [f"video{i}" for i in range(n_videos)]
    words_per_video = [rng.choice(len(WORDS), size=5, replace=False) for _ in vids]
    codes = np.random.default_rng(7).standard_normal((len(WORDS), 16)).astype(np.float32)
    latent = np.stack([codes[w].sum(0) for w in words_per_video])

    for feat, dim in feats.items():
        proj = np.random.default_rng(abs(hash(feat)) % 997).standard_normal(
            (16, dim)).astype(np.float32) * 0.2
        mat = latent @ proj + 0.1 * rng.standard_normal((n_videos, dim)).astype(np.float32)
        write_bigfile(os.path.join(root, coll, "FeatureData", feat), vids, mat)

    if with_frames:
        fname, fdim = FRAME_FEAT
        proj = np.random.default_rng(41).standard_normal((16, fdim)).astype(np.float32) * 0.2
        ids, rows = [], []
        for i, vid in enumerate(vids):
            for f in range(int(rng.integers(2, 5))):
                ids.append(f"{vid}_{f}")
                rows.append(latent[i] @ proj + 0.1 * rng.standard_normal(fdim).astype(np.float32))
        write_bigfile(os.path.join(root, coll, "FeatureData", "frame", fname),
                      ids, np.stack(rows))

    os.makedirs(os.path.join(root, coll, "TextData"), exist_ok=True)
    cap_lines, cap_ids = [], []
    for i, vid in enumerate(vids):
        base = [WORDS[j] for j in words_per_video[i]]
        for c in range(caps):
            order = rng.permutation(5)[:4]
            cap_lines.append(f"{vid}#{c} a {' '.join(base[j] for j in order)}")
            cap_ids.append(f"{vid}#{c}")
    open(os.path.join(root, coll, "TextData", f"{coll}.caption.txt"), "w").write(
        "\n".join(cap_lines))

    if with_clip_text:
        # precomputed CLIP text features next to the caption file
        tproj = np.random.default_rng(13).standard_normal((16, 512)).astype(np.float32) * 0.2
        tmat = np.repeat(latent, caps, axis=0) @ tproj
        tmat += 0.05 * rng.standard_normal(tmat.shape).astype(np.float32)
        write_bigfile(os.path.join(root, coll, "TextData", CLIP_TEXT_DIR),
                      cap_ids, tmat)

    os.makedirs(os.path.join(root, coll, "VideoSets"), exist_ok=True)
    open(os.path.join(root, coll, "VideoSets", f"{coll}.txt"), "w").write(
        "\n".join(vids))


def build_w2v_flickr(root):
    """The reference's hard-coded w2v path: word2vec/flickr/vec500flickr30m."""
    rng = np.random.default_rng(3)
    vocab = WORDS + ["a", "the"]
    write_bigfile(os.path.join(root, "word2vec", "flickr", "vec500flickr30m"),
                  vocab, rng.standard_normal((len(vocab), 500)).astype(np.float32))


@pytest.mark.parametrize(
    "config_name,parm,feats,with_frames",
    [
        ("laff", "0_12_0_12_0_0_1", LAFF_VID_FEATS, False),
        ("FrameLaff_NoFrameFc_StrongCLIP_adjust", "0_7_1_12_0_12_0",
         FRAMELAFF_VID_FEATS, True),
    ],
    ids=["laff_headline", "laffml_headline"],
)
def test_headline_config_trains(tmp_path, config_name, parm, feats, with_frames):
    root = str(tmp_path)
    build_world(root, "toytrain", 24, 2, 0, feats, with_frames=with_frames)
    build_world(root, "toyval", 12, 1, 5, feats, with_frames=with_frames)
    build_w2v_flickr(root)

    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name=config_name, parm_adjust_config=parm,
        num_epochs=2, batch_size=12, model_prefix="headline", metric="mir",
    )
    prepared = prepare(opt)
    spec = prepared.spec

    # published architecture facts
    assert spec.txt.common_dim == 4096
    assert spec.txt.attention.heads == 8
    assert spec.txt.attention.kind == "Multi_head_MyApply_Attention"
    assert "clip" in dict(spec.txt.features)
    assert "clip" in spec.txt.no_transform  # StrongCLIP passthrough
    if with_frames:
        assert dict(spec.vis.frame_features) == {FRAME_FEAT[0]: 512}
        assert FRAME_FEAT[0] in spec.vis.no_transform
        assert spec.vis.compute_dtype == "bfloat16"  # float16=True config
        assert not spec.vis.frame_add_fc  # NoFrameFc
    else:
        assert dict(spec.vis.features)["clip_finetune_8frame_uniform_1103"] == 512
        assert "clip_finetune_8frame_uniform_1103" in spec.vis.no_transform

    result = train_main(opt, prepared=prepared)
    assert result["best_perf"] > 0.15, result
    assert os.path.exists(os.path.join(result["model_path"], "model_best.pth.tar"))
