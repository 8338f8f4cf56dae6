"""Model-name registry + collection checker."""

import numpy as np
import pytest

from laff_tpu.models import AttentionSpec, LAFFSpec, TowerSpec
from laff_tpu.models.registry import MODEL_NAMES, get_model


def mini_spec(kind="Multi_head_MyApply_Attention"):
    return LAFFSpec(
        txt=TowerSpec(features=(("bow", 8),), common_dim=16,
                      attention=AttentionSpec(kind=kind, heads=2)),
        vis=TowerSpec(features=(("f1", 8),), common_dim=16,
                      attention=AttentionSpec(kind=kind, heads=2)),
    )


def test_registry_names():
    model = get_model("LAFF", mini_spec())
    assert model is not None
    with pytest.raises(KeyError):
        get_model("NotAModel", mini_spec())
    with pytest.raises(ValueError):
        get_model("FrameLAFF", mini_spec())  # no frame features
    with pytest.raises(ValueError):
        get_model("W2VVPP", mini_spec())  # not concat
    assert get_model("W2VVPP", mini_spec(kind="concat")) is not None
    assert get_model("End2EndClip") is not None
    assert "LAFF" in MODEL_NAMES


def test_check_collection(tmp_path):
    from laff_tpu.data.check import check_collection, check_environment

    from helpers import build_collection, build_w2v

    root = str(tmp_path)
    build_collection(root, "toy", feat_dims=(("clip_ft", 8),))
    report = check_collection(root, "toy", ["clip_ft", "missing_feat"])
    assert any("clip_ft" in line for line in report["ok"])
    assert any("missing_feat" in line for line in report["missing"])
    assert not check_environment(root, ["toy"], ["clip_ft"])  # w2v missing
    build_w2v(root)
    import os

    os.makedirs(os.path.join(root, "word2vec", "flickr"), exist_ok=True)
    os.symlink(
        os.path.join(root, "word2vec", "toy"),
        os.path.join(root, "word2vec", "flickr", "vec500flickr30m"),
    )
    assert check_environment(root, ["toy"], ["clip_ft"])


def test_live_bert_gated():
    """Live BERT needs downloadable/cached weights; construction must fail
    with a clear error offline, and the class exists for parity."""
    import pytest

    from laff_tpu.models.bert import LiveBertTextFeaturizer

    try:
        feat = LiveBertTextFeaturizer()
    except Exception:
        pytest.skip("BERT weights unavailable offline")
    out = feat.encode_batch(["a dog runs"])
    assert out.shape == (1, 768)
