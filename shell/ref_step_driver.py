"""Step-level training-equivalence driver (reference side).

Builds the reference LAFF model on a synthetic world, saves its INITIAL
state dict, then runs its own train step (``model(train_data, epoch)`` —
the reference's forward IS one full optimizer step, model/model.py:964-1001)
over deterministic batches (shuffle=False, workers=0) with dropout disabled,
recording the loss at every step.

The laff_tpu side (shell/train_equivalence.py:run_ours_steps) imports the
saved initial state through the torch-import pipeline and replays the SAME
batches through its own jitted train step: with identical weights, data and
no dropout, per-step losses isolate the update rule (adam eps placement,
grad clipping, BN batch-stats handling) from init/shuffle luck.

Run in a fresh torch-only process:
    python shell/ref_step_driver.py --rootpath R --train C --epochs 2 \
        --batch_size 16 --lr 2e-3 --out steps.json --state_out init.pth.tar
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("LAFF_REFERENCE", "/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rootpath", required=True)
    ap.add_argument("--train", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--common", type=int, default=32)
    ap.add_argument("--out", required=True)
    ap.add_argument("--state_out", required=True)
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

    import torch
    from bigfile import BigFile
    from txt2vec import get_txt2vec

    import data_provider as data
    from model.model import get_model

    config = sys.modules["configs.ref_equiv"].config()
    config.dropout = 0.0
    config.last_dropout = 0.0

    root, train = args.rootpath, args.train
    vis_feat_files = {
        feat: BigFile(os.path.join(root, train, "FeatureData", feat))
        for feat in config.vid_feats
    }
    # the field fills prepare_config would do (trainer.py:126-214)
    config.vis_fc_layers[0] = {f: bf.ndims for f, bf in vis_feat_files.items()}
    config.txt_fc_layers = [0, args.common]
    _, config.pooling = config.text_encoding["rnn_encoding"]["name"].split("_", 1)
    vdir = os.path.join(root, train, "TextData", "vocab")
    config.t2v_bow = get_txt2vec("bow_nsw")(
        os.path.join(vdir, "bow_nsw_1.pkl"), norm=config.bow_norm)
    config.t2v_w2v = get_txt2vec("w2v_nsw")(
        os.path.join(root, "word2vec", "flickr", "vec500flickr30m"))
    config.t2v_idx = get_txt2vec("idxvec")(os.path.join(vdir, "gru_1.pkl"))
    config.task3 = False

    torch.manual_seed(args.seed)
    model = get_model("LAFF", torch.device("cpu"), config)
    torch.save({"model": model.state_dict()}, args.state_out)

    capfile = os.path.join(root, train, "TextData", f"{train}.caption.txt")
    vis_ids = [l.strip() for l in
               open(os.path.join(root, train, "VideoSets", f"{train}.txt"))]
    loader = data.pair_provider({
        "vis_feat_files": vis_feat_files, "capfile": capfile,
        "vis_frame_feat_dicts": None, "vis_ids": vis_ids,
        "max_frame": config.max_frame, "sample_type": "uniform",
        "vis_muti_feat_dicts": None, "frame_id_path_file": None,
        "capfile_task2": None, "capfile_task3": None, "pin_memory": False,
        "batch_size": args.batch_size, "num_workers": 0, "config": config,
        "collection": train, "shuffle": False, "task3": False,
    })

    model.train()
    losses, batches = [], []
    for epoch in range(args.epochs):
        for train_data in loader:
            loss_items = model(train_data, epoch)
            v = loss_items["triplet_loss"]
            losses.append(float(v.item() if hasattr(v, "item") else v))
            if epoch == 0:
                batches.append({
                    "cap_ids": list(train_data["cap_ids"]),
                    "captions": list(train_data["captions"]["caption"]),
                    "vis_ids": list(train_data["vis_ids"]),
                })

    with open(args.out, "w") as fh:
        json.dump({"losses": losses, "batches": batches,
                   "steps_per_epoch": len(batches)}, fh, indent=1)
    print(json.dumps({"ok": True, "n_steps": len(losses),
                      "first": losses[0] if losses else None,
                      "last": losses[-1] if losses else None}))


if __name__ == "__main__":
    main()
