"""Live in-graph BERT tower (bert_frozen=False): the transformer runs
inside the jitted train step and fine-tunes with the model (reference
BertTxtEncoder, model/model.py:437-466; backbone lr/20, 2013-2020).
Runs a random tiny BERT offline — pretrained weights import is a separate
local-path hook (models/bert.py:import_bert_params)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import build_collection, build_w2v

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]


@pytest.fixture
def bert_vocab(tmp_path, monkeypatch):
    from laff_tpu.data.synth import WORDS

    words = SPECIALS + WORDS + ["the", "a"]
    words += [f"unused{i}" for i in range(64 - len(words))]
    path = str(tmp_path / "bert_vocab.txt")
    open(path, "w").write("\n".join(words))
    monkeypatch.setenv("LAFF_TPU_TEST_BERT_VOCAB", path)
    return path


def test_bert_tokens_featurizer(bert_vocab):
    from laff_tpu.models.bert import BertTokensFeaturizer

    f = BertTokensFeaturizer("bert-tiny-test", max_length=8,
                             vocab_file=bert_vocab)
    out = f.encode_tokens(["dog runs", "cat sits quietly on the table"])
    assert out["bert_ids"].shape == (2, 8)
    assert out["bert_mask"].shape == (2, 8)
    assert out["bert_ids"].dtype == np.int32
    # [CLS] dog runs [SEP] pad...
    assert out["bert_mask"][0].sum() == 4


def test_backbone_lr_scaling():
    """BERT-subtree updates come out 1/20 of an identical non-backbone
    param's update (reference per-group lr/20)."""
    import optax

    from laff_tpu.engine.trainer import make_optimizer
    from laff_tpu.models.spec import BertSpec

    class Cfg:
        grad_clip = 0
        optimizer = "adam"
        lr = 1e-3

    class TxtSpec:
        bert = BertSpec()

    class Spec:
        txt = TxtSpec()

    params = {
        "txt_net": {
            "bert": {"w": jnp.ones((4,))},
            "transform_bow": {"w": jnp.ones((4,))},
        }
    }
    tx = make_optimizer(Cfg(), Spec())
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    ratio = (updates["txt_net"]["bert"]["w"]
             / updates["txt_net"]["transform_bow"]["w"])
    np.testing.assert_allclose(np.asarray(ratio), 1.0 / 20.0, rtol=1e-6)


def test_train_live_bert_end_to_end(tmp_path, bert_vocab):
    """tiny_bert config: bow + in-graph BERT trains end-to-end; the
    checkpoint carries the transformer's params and prediction rebuilds
    the live tokenizer path."""
    from laff_tpu.engine import Options
    from laff_tpu.engine.checkpoint import load_checkpoint
    from laff_tpu.engine.predictor import PredictOptions, main as predict_main
    from laff_tpu.engine.trainer import main as train_main

    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=24, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=12, caps_per_video=1, seed=5)
    build_collection(root, "toytest", n_videos=12, caps_per_video=1, seed=9)
    build_w2v(root)
    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny_bert", num_epochs=3, batch_size=12,
        model_prefix="bert_run", metric="mir",
    )
    result = train_main(opt)
    assert np.isfinite(result["best_perf"]) and result["best_perf"] > 0
    ckpt = load_checkpoint(os.path.join(result["model_path"],
                                        "model_best.pth.tar"))
    assert ckpt["spec"].txt.bert is not None
    bert_params = ckpt["params"]["txt_net"]["bert"]
    assert "encoder" in bert_params and "pooler" in bert_params

    popt = PredictOptions(
        testCollection="toytest",
        model_path=os.path.join(result["model_path"], "model_best.pth.tar"),
        sim_name="bert_run", rootpath=root,
        query_sets="toytest.caption.txt",
        predict_result_file=os.path.join(root, "result_log", "bert.txt"),
        batch_size=12,
    )
    res = predict_main(popt)["toytest.caption.txt"]
    assert np.isfinite(res["t2v"]).all()
