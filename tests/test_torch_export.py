"""Round-trip: our checkpoint -> reference state dict -> re-import ->
identical embeddings; plus direct evaluation in the reference model."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from laff_tpu.engine.torch_export import export_state_dict
from laff_tpu.engine.torch_import import convert_state_dict
from laff_tpu.models import AttentionSpec, GruSpec, LAFFModel, LAFFSpec, TowerSpec


def make_spec():
    attn = AttentionSpec(kind="Multi_head_MyApply_Attention", heads=2,
                         with_ave=True, mul=False, split_head=True)
    return LAFFSpec(
        txt=TowerSpec(features=(("rnn", 8), ("bow", 20)), common_dim=16,
                      attention=attn, batch_norm=True,
                      gru=GruSpec(vocab_size=30, we_dim=6, rnn_size=8)),
        vis=TowerSpec(features=(("clip_ft", 12),), common_dim=16,
                      attention=attn, batch_norm=True),
    )


def test_export_import_roundtrip(rng):
    spec = make_spec()
    model = LAFFModel(spec)
    txt = {
        "rnn_ids": jnp.asarray(rng.integers(0, 30, (4, 6)).astype(np.int32)),
        "rnn_len": jnp.asarray(np.array([6, 3, 4, 5], np.int32)),
        "bow": jnp.asarray(rng.standard_normal((4, 20)).astype(np.float32)),
    }
    vis = {"clip_ft": jnp.asarray(rng.standard_normal((4, 12)).astype(np.float32))}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis
    )
    ckpt = {
        "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, variables.get("batch_stats", {})
        ),
        "schedule": jax.tree_util.tree_map(
            np.asarray, variables.get("schedule", {})
        ),
        "spec": spec,
    }
    t0, v0 = model.apply(variables, txt, vis)

    sd = export_state_dict(ckpt)
    # key-shape sanity: reference naming
    assert "txt_net.transform_layer.bow_encoder_transform.fc1.weight" in sd
    assert "vis_net.VisMutiTransformNet.clip_ft.bn1.running_mean" in sd
    assert "txt_net.attention_layer.attention_layer.1.embedding_common.0.weight" in sd

    params2, stats2, sched2 = convert_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, spec
    )
    vars2 = {"params": params2, "batch_stats": stats2, "schedule": sched2}
    # gru params aren't reconstructible from nothing: importer must have them
    t1, v1 = model.apply(vars2, txt, vis)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir("/root/reference/model"),
                    reason="reference tree absent")
def test_exported_checkpoint_loads_into_reference_model(rng, tmp_path_factory):
    """The exported state dict loads into the ACTUAL reference model and
    the reference then reproduces our visual-tower embeddings."""
    import test_reference_parity as RP

    class _Factory:
        def mktemp(self, name):
            import pathlib

            d = tmp_path_factory.mktemp(name)
            return pathlib.Path(d)

    world = RP.reference_world.__wrapped__(_Factory())
    ref_model, ref_config = RP._load_reference_model(world)

    # our model with the exact same architecture
    from laff_tpu.engine.torch_import import spec_from_reference_config

    import copy

    config2 = copy.copy(ref_config)
    config2.t2v_w2v = None
    spec = spec_from_reference_config(config2)
    ours = LAFFModel(spec)
    b = 5
    txt = {
        "rnn_ids": jnp.asarray(rng.integers(0, len(world["gru_vocab"]), (b, 6)).astype(np.int32)),
        "rnn_len": jnp.asarray(np.array([6, 4, 3, 5, 6], np.int32)),
        "bow": jnp.asarray(rng.standard_normal((b, len(world["bow_vocab"]))).astype(np.float32)),
        "w2v": jnp.asarray(rng.standard_normal((b, 12)).astype(np.float32)),
    }
    vis_np = {
        "clip_ft": rng.standard_normal((b, 16)).astype(np.float32),
        "x3d": rng.standard_normal((b, 12)).astype(np.float32),
    }
    vis = {k: jnp.asarray(v) for k, v in vis_np.items()}
    variables = ours.init(
        {"params": jax.random.key(5), "dropout": jax.random.key(6)}, txt, vis
    )
    our_vis_emb = np.asarray(ours.apply(variables, vis, method=ours.encode_vis))

    ckpt = {
        "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, variables.get("batch_stats", {})
        ),
        "schedule": jax.tree_util.tree_map(
            np.asarray, variables.get("schedule", {})
        ),
        "spec": spec,
    }
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(ckpt).items()}
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected  # every exported key must land

    ref_model.eval()
    with torch.no_grad():
        ref_vis_emb = ref_model.vis_net(
            {k: torch.from_numpy(v) for k, v in vis_np.items()}
        ).numpy()
    np.testing.assert_allclose(our_vis_emb, ref_vis_emb, rtol=1e-4, atol=1e-5)


def test_cli_predict_on_exported_torch_checkpoint(tmp_path):
    """Train -> export to reference torch format -> do_predictor CLI on the
    exported .pth.tar (sniffed + imported) reproduces the native metrics."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from helpers import build_collection, build_w2v
    from laff_tpu.engine import Options
    from laff_tpu.engine.checkpoint import load_checkpoint
    from laff_tpu.engine.predictor import PredictOptions, main as predict_main
    from laff_tpu.engine.torch_export import save_torch_checkpoint
    from laff_tpu.engine.trainer import main as train_main

    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=24, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=12, caps_per_video=1, seed=5)
    build_collection(root, "toytest", n_videos=16, caps_per_video=1, seed=9)
    build_w2v(root)
    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=3, batch_size=12,
        model_prefix="xport",
    )
    result = train_main(opt)
    native_ckpt = os.path.join(result["model_path"], "model_best.pth.tar")

    torch_path = os.path.join(root, "exported.pth.tar")
    save_torch_checkpoint(load_checkpoint(native_ckpt), torch_path)

    def predict(path, sim):
        return predict_main(PredictOptions(
            testCollection="toytest", model_path=path, sim_name=sim,
            rootpath=root, query_sets="toytest.caption.txt", batch_size=16,
            overwrite=1,
            predict_result_file=os.path.join(root, "result_log", sim + ".txt"),
        ))["toytest.caption.txt"]["t2v"]

    native = predict(native_ckpt, "native")
    roundtrip = predict(torch_path, "roundtrip")
    np.testing.assert_allclose(roundtrip, native, rtol=1e-4, atol=1e-4)


def test_export_tied_model_materializes_fc(tmp_path):
    """A weight-tied checkpoint exports with the shared fc materialized
    into BOTH towers' fc1 slots (the reference is effectively untied)."""
    from helpers import build_collection, build_w2v
    from laff_tpu.engine import Options
    from laff_tpu.engine.checkpoint import load_checkpoint
    from laff_tpu.engine.torch_export import export_state_dict
    from laff_tpu.engine.trainer import main as train_main

    root = str(tmp_path)
    feat_dims = (("clip_ft", 16), ("w2v_like8", 8))
    build_collection(root, "toytrain", n_videos=16, caps_per_video=2,
                     feat_dims=feat_dims, seed=0)
    build_collection(root, "toyval", n_videos=8, caps_per_video=1,
                     feat_dims=feat_dims, seed=5)
    build_w2v(root)
    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=root, val_set="no", config_name="tiny_tied",
                  num_epochs=2, batch_size=8, model_prefix="tie_exp",
                  metric="mir")
    result = train_main(opt)
    ckpt = load_checkpoint(os.path.join(result["model_path"],
                                        "model_best.pth.tar"))
    sd = export_state_dict(ckpt)
    tkey = "txt_net.transform_layer.w2v_encoder_transform.fc1.weight"
    vkey = "vis_net.VisMutiTransformNet.w2v_like8.fc1.weight"
    assert tkey in sd and vkey in sd
    np.testing.assert_array_equal(sd[tkey], sd[vkey])  # one shared fc
