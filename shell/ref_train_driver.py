"""Run the REFERENCE PyTorch LAFF trainer (/root/reference) on a synthetic
world and dump its training curves as JSON.

This is one half of the training-equivalence study: the reference trainer
(ref: trainer.py:315-443, model/model.py:964-1001) is executed UNMODIFIED —
the only instrumentation is a recording stand-in for its TensorBoard
``SummaryWriter`` (the reference logs every loss/metric through
``writer.add_scalar``, trainer.py:573-575, 617-623), so its loss and
validation trajectories can be exported without touching its code.

The world must already exist on disk in the reference collection layout
(built by ``laff_tpu.data.synth.build_collection``), including a toy
word2vec BigFile at ``<root>/word2vec/flickr/vec500flickr30m`` (the path
the reference hardcodes, trainer.py:190).

Run in a FRESH process (torch-only; no JAX):
    python shell/ref_train_driver.py --rootpath R --train C1 --val C2 \
        --epochs 10 --batch_size 16 --lr 2e-3 --seed 2 --out /tmp/ref.json
"""

import argparse
import importlib.machinery
import json
import os
import pickle
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("LAFF_REFERENCE", "/root/reference")


def install_recording_tensorboard(scalars):
    """Stand-in for torch.utils.tensorboard that records add_scalar calls
    (and skips importing TensorFlow, which the real tensorboard pulls in)."""
    name = "torch.utils.tensorboard"
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)

    class SummaryWriter:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, tag, value, step=None):
            scalars.append((tag, float(value), step))

        def close(self):
            pass

    mod.SummaryWriter = SummaryWriter
    sys.modules[name] = mod


def inject_equiv_config(lr, heads, common):
    """Create configs.ref_equiv inside the reference's configs package:
    a LAFF (multi-space) config matched knob-for-knob with the repo's
    configs/tiny.py so both stacks train the same architecture."""
    # Load the REFERENCE's base_config by file path: in-process callers
    # (run_ours_steps under pytest) may already hold the repo's root
    # ``configs`` package in sys.modules, which would shadow the
    # reference's and make ``import configs.base_config`` fail.
    base = _load_reference_base_config()

    mod = types.ModuleType("configs.ref_equiv")
    mod.__spec__ = importlib.machinery.ModuleSpec("configs.ref_equiv", loader=None)

    class config(base.config):
        model_name = "LAFF"
        vid_feats = ["clip_ft", "x3d"]
        vis_fc_layers = ["0", common]
        txt_fc_layers = "0-%d" % common
        threshold = 1
        we_dim = 8
        rnn_size = 8
        batch_norm = True
        dropout = 0.2
        optimizer = "adam"
        lr_decay_rate = 0.99
        multi_head_attention = {"dropout": 0.0, "heads": heads,
                                "embed_dim_qkv": 8}
        attention_param_each_head = {"with_ave": False, "mul": False,
                                    "split_head": True}
        txt_attention = base.config.attention_types[12]
        vis_attention = base.config.attention_types[12]
        max_frame = 6
        float16 = False
        eval_batch_size = 64

    config.lr = lr
    # make the class picklable (checkpoints embed the config instance):
    # pickle resolves it as configs.ref_equiv.config via sys.modules
    config.__module__ = "configs.ref_equiv"
    config.__qualname__ = "config"
    mod.config = config
    sys.modules["configs.ref_equiv"] = mod
    # attach to whichever ``configs`` package is live so the reference's
    # ``importlib.import_module('configs.ref_equiv')`` (trainer.py:24-26)
    # resolves in the fresh-subprocess case
    if "configs" in sys.modules:
        sys.modules["configs"].ref_equiv = mod


def _load_reference_base_config():
    """Import ``<REFERENCE>/configs/base_config.py`` under a private name,
    immune to a same-named repo package already in sys.modules."""
    import importlib.util

    path = os.path.join(REFERENCE, "configs", "base_config.py")
    spec = importlib.util.spec_from_file_location("_ref_base_config", path)
    base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(base)
    return base


def build_reference_vocabs(rootpath, train):
    """Pickle reference-format Vocabulary files where prepare_config looks
    for them (trainer.py:186-208). A laff_tpu run may have written its own
    Vocabulary class at the same path first — the reference can't unpickle
    that (laff_tpu reads BOTH via a compat unpickler), so anything the
    reference can't load is rebuilt reference-format in place."""
    import build_vocab as ref_build_vocab

    capfile = os.path.join(rootpath, train, "TextData", f"{train}.caption.txt")
    vdir = os.path.join(rootpath, train, "TextData", "vocab")
    os.makedirs(vdir, exist_ok=True)
    for enc in ("bow_nsw", "gru"):
        path = os.path.join(vdir, f"{enc}_1.pkl")
        if os.path.exists(path):
            try:
                with open(path, "rb") as fh:
                    pickle.load(fh)
                continue
            except Exception:
                os.unlink(path)  # laff_tpu-format: rebuild reference-format
        vocab, _ = ref_build_vocab.build_vocab(capfile, enc, threshold=1, lang="en")
        with open(path, "wb") as fw:
            pickle.dump(vocab, fw, pickle.HIGHEST_PROTOCOL)


def segment_curves(scalars):
    """Walk the ordered add_scalar stream and split it into per-epoch
    chunks: each epoch opens with train/learning_rate (trainer.py:378)."""
    epochs = []
    cur = None
    for tag, value, _step in scalars:
        if tag == "train/learning_rate":
            cur = {"lr": value, "loss": []}
            epochs.append(cur)
        elif cur is None:
            continue
        elif tag == "train/Loss":
            cur["loss"].append(value)
        elif tag.startswith("task1val/"):
            cur[tag.split("/", 1)[1]] = value
    return epochs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rootpath", required=True)
    ap.add_argument("--train", required=True)
    ap.add_argument("--val", required=True)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--common", type=int, default=32)
    ap.add_argument("--model_prefix", default="ref_equiv_run")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _stubs import install_reference_stubs

    install_reference_stubs()
    scalars = []
    install_recording_tensorboard(scalars)
    sys.path.insert(0, REFERENCE)

    build_reference_vocabs(args.rootpath, args.train)
    inject_equiv_config(args.lr, args.heads, args.common)

    sys.argv = [
        "do_trainer.py", args.train, args.val,
        "--rootpath", args.rootpath, "--device", "cpu", "--val_set", "no",
        "--config_name", "ref_equiv", "--num_epochs", str(args.epochs),
        "--batch_size", str(args.batch_size), "--workers", "0",
        "--random_seed", str(args.seed), "--model_prefix", args.model_prefix,
        "--overwrite", "1",
    ]
    from do_trainer import parse_args

    opt = parse_args()
    import trainer

    trainer.main(opt)

    epochs = segment_curves(scalars)
    report = {
        "framework": "reference-pytorch",
        "epochs": epochs,
        "best_perf": max((e.get("mir", 0.0) for e in epochs), default=0.0),
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"ok": True, "n_epochs": len(epochs),
                      "best_perf": report["best_perf"]}))


if __name__ == "__main__":
    main()
