"""Orbax directory-format checkpoints: roundtrip fidelity and transparent
loading through the real predictor CLI surface."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from helpers import build_collection, build_w2v

from laff_tpu.engine import Options
from laff_tpu.engine.checkpoint import load_checkpoint, save_checkpoint_orbax
from laff_tpu.engine.predictor import PredictOptions, main as predict_main
from laff_tpu.engine.trainer import main as train_main


def test_orbax_roundtrip_unit(tmp_path):
    state = {
        "epoch": 3,
        "best_perf": 0.5,
        "params": {"net": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "batch_stats": {},
        "schedule": {"g": np.float32(0.9)},
        "config": {"note": "meta survives"},
    }
    d = str(tmp_path / "ck")
    save_checkpoint_orbax(state, d)
    back = load_checkpoint(d)
    assert back["epoch"] == 3
    assert back["config"]["note"] == "meta survives"
    np.testing.assert_array_equal(
        back["params"]["net"]["w"], state["params"]["net"]["w"]
    )
    assert back["batch_stats"] == {}
    np.testing.assert_allclose(back["schedule"]["g"], 0.9)


def test_predictor_loads_orbax_directory(tmp_path):
    """Train -> re-save as orbax dir -> do_predictor on the DIRECTORY path
    reproduces the native pickle metrics exactly."""
    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=16, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=8, caps_per_video=1, seed=5)
    build_collection(root, "toytest", n_videos=12, caps_per_video=1, seed=9)
    build_w2v(root)
    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=2, batch_size=8,
        model_prefix="orb",
    )
    result = train_main(opt)
    pickle_path = os.path.join(result["model_path"], "model_best.pth.tar")
    orbax_dir = os.path.join(root, "orbax_ckpt")
    save_checkpoint_orbax(load_checkpoint(pickle_path), orbax_dir)

    def predict(path, sim):
        return predict_main(PredictOptions(
            testCollection="toytest", model_path=path, sim_name=sim,
            rootpath=root, query_sets="toytest.caption.txt", batch_size=16,
            overwrite=1,
            predict_result_file=os.path.join(root, "result_log", sim + ".txt"),
        ))["toytest.caption.txt"]["t2v"]

    native = predict(pickle_path, "native")
    via_orbax = predict(orbax_dir, "orbax")
    np.testing.assert_allclose(via_orbax, native, rtol=0, atol=0)
