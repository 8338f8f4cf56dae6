"""Drive the REFERENCE predictor end-to-end on a laff_tpu-exported
checkpoint (.pth.tar) and dump the metric rows it writes.

This executes the reference's own ``predictor.main()`` (predictor.py:409-437
-> get_predict_file:129-287) unmodified: torch.load of the exported file,
``trainer.prepare_config`` config rebuild, reference data loaders, reference
``model.predict``, reference ``evaluation.eval``, and the TSV result_log
append — the strongest offline form of the "runs unchanged against
reference PyTorch checkpoints" requirement, in the export direction.

The exported checkpoint must carry an argparse-Namespace ``opt`` whose
config_name resolves to the injected ``configs.ref_equiv`` (see
shell/ref_train_driver.py); shell/train_equivalence.py:fix_checkpoint_for_reference
prepares one from a laff_tpu export.

Run in a fresh torch-only process:
    python shell/ref_predict_driver.py --rootpath R --test equivtest \
        --ckpt exported_ref.pth.tar --out pred.json
"""

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("LAFF_REFERENCE", "/root/reference")


def parse_result_row(path):
    """Last appended row of a reference result_log TSV:
    time \t model_path \t collection \t r1 r5 r10 medr meanr mir mAP \t parms"""
    with open(path) as fh:
        row = [l for l in fh.read().splitlines() if l.strip()][-1]
    cells = row.split("\t")
    nums = []
    for c in cells:
        if re.fullmatch(r"-?\d+(\.\d+)?", c.strip()):
            nums.append(float(c))
    # the first 7 numeric cells are r1 r5 r10 medr meanr mir mAP
    return nums[:7]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rootpath", required=True)
    ap.add_argument("--test", required=True)
    ap.add_argument("--train", default="equivtrain")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--query_sets", default=None)
    ap.add_argument("--sim_name", default="ref_export_check")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--common", type=int, default=32)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, os.path.join(REPO, "shell"))
    from _stubs import install_reference_stubs
    from ref_train_driver import (build_reference_vocabs, inject_equiv_config,
                                  install_recording_tensorboard)

    install_reference_stubs()
    install_recording_tensorboard([])
    sys.path.insert(0, REFERENCE)

    build_reference_vocabs(args.rootpath, args.train)
    inject_equiv_config(args.lr, args.heads, args.common)

    query_sets = args.query_sets or f"{args.test}.caption.txt"
    result_file = os.path.join(args.rootpath, "ref_result_log",
                               "result_test.txt")
    sys.argv = [
        "predictor.py", args.test, args.ckpt, args.sim_name,
        "--rootpath", args.rootpath, "--query_sets", query_sets,
        "--overwrite", "1", "--num_workers", "0", "--device", "cpu",
        "--batch_size", str(args.batch_size),
        "--predict_result_file", result_file,
    ]
    # torch>=2.6 loads weights_only by default; the checkpoint carries an
    # argparse.Namespace opt (exactly what the reference's own trainer
    # pickles), which needs allowlisting
    import torch

    torch.serialization.add_safe_globals([argparse.Namespace])

    import predictor

    predictor.main()

    t2v = parse_result_row(
        os.path.join(args.rootpath, "ref_result_log", "TextToVideo",
                     "result_test.txt"))
    v2t = parse_result_row(
        os.path.join(args.rootpath, "ref_result_log", "VideoToText",
                     "result_test.txt"))
    report = {"t2v": t2v, "v2t": v2t, "sim_name": args.sim_name}
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"ok": True, "t2v": t2v, "v2t": v2t}))


if __name__ == "__main__":
    main()
