#!/usr/bin/env python3
"""Init-distribution audit: per-parameter init statistics, ours vs the
UNMODIFIED reference model, matched by exported torch names.

Levels 1-2 of the training-equivalence study import the reference's init
weights, so they cannot see a from-scratch init mismatch; level 3 can
only see its *consequence* (a mean best-mir deficit). This audit sees the
*cause*: it instantiates both models from their own initializers over N
seeds on the same world and compares per-parameter std / |max| / mean.
This is how the round-4 w2v-init gate bug was confirmed fixed (the
reference w2v-initializes the GRU embedding only at we_dim==500,
model/model.py:334-336; our generalized gate cost ~0.05 mean best mir).

Known benign diffs it reports:
- reference-only ``attention_layer.layer_norm.{weight,bias}``: registered
  by ``Multi_head_MyApply_Attention`` (Attention.py:504) but NEVER used in
  forward and init consumes no RNG — dead parameters;
- ours-only BN ``running_mean/running_var/num_batches_tracked``: flax
  batch_stats exported alongside params.

Usage:
    python shell/init_distribution_audit.py [--root WORLD] [--seeds 10]
World defaults to a fresh synthetic one (shell/train_equivalence.py
layout). Exits 1 if any matched parameter's std differs by >15%.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "shell"))

BENIGN_REF_ONLY = ("attention_layer.layer_norm.",)
BENIGN_OURS_ONLY = (".running_mean", ".running_var", ".num_batches_tracked")

_REF_SIDE = r'''
import json, os, sys
REPO = {repo!r}
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "shell"))
from _stubs import install_reference_stubs
install_reference_stubs()
from ref_train_driver import (install_recording_tensorboard,
                              inject_equiv_config, build_reference_vocabs)
install_recording_tensorboard([])
sys.path.insert(0, os.environ.get("LAFF_REFERENCE", "/root/reference"))
root, out, n_seeds = sys.argv[1], sys.argv[2], int(sys.argv[3])
build_reference_vocabs(root, "equivtrain")
inject_equiv_config(2e-3, 4, 32)
sys.argv = ["do_trainer.py", "equivtrain", "equivval", "--rootpath", root,
            "--device", "cpu", "--val_set", "no", "--config_name",
            "ref_equiv", "--num_epochs", "1", "--batch_size", "16",
            "--workers", "0", "--random_seed", "2", "--model_prefix",
            "init_audit", "--overwrite", "1"]
from do_trainer import parse_args
opt = parse_args()
import trainer as ref_trainer
import torch
from model.model import get_model
stats = {{}}
for seed in range(2, 2 + n_seeds):
    opt.random_seed = seed
    cfgs = ref_trainer.prepare_config(opt, checkToSkip=False)
    config = cfgs["config"] if isinstance(cfgs, dict) else cfgs.config
    torch.manual_seed(seed)
    model = get_model(config.model_name, torch.device("cpu"), config)
    for name, p in model.named_parameters():
        t = p.detach().double()
        s = stats.setdefault(name, {{"shape": list(t.shape), "std": [],
                                     "absmax": [], "mean": []}})
        s["std"].append(float(t.std()) if t.numel() > 1 else 0.0)
        s["absmax"].append(float(t.abs().max()))
        s["mean"].append(float(t.mean()))
json.dump({{n: {{"shape": s["shape"],
                 "std": sum(s["std"]) / len(s["std"]),
                 "absmax": max(s["absmax"]),
                 "mean": sum(s["mean"]) / len(s["mean"])}}
            for n, s in stats.items()}}, open(out, "w"))
'''

_OURS_SIDE = r'''
import jax; jax.config.update("jax_platforms", "cpu")
import json, sys
sys.path.insert(0, {repo!r})
import numpy as np
from laff_tpu.engine import Options
from laff_tpu.engine.prepare import prepare
from laff_tpu.engine.torch_export import export_state_dict
from laff_tpu.models.registry import get_model
root, out, n_seeds = sys.argv[1], sys.argv[2], int(sys.argv[3])
stats = {{}}
for seed in range(2, 2 + n_seeds):
    opt = Options(trainCollection="equivtrain", valCollection="equivval",
                  rootpath=root, val_set="no", config_name="tiny",
                  num_epochs=1, batch_size=16,
                  model_prefix=f"init_audit_{{seed}}", random_seed=seed,
                  workers=0, overwrite=1)
    prepared = prepare(opt)
    model = get_model(prepared.config.model_name, prepared.spec)
    batch = next(iter(prepared.train_feed.epoch(0)))
    variables = model.init(
        {{"params": jax.random.key(seed),
          "dropout": jax.random.key(seed + 1)}},
        batch["txt"], batch["vis"])
    ckpt = {{"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {{}}),
             "config": prepared.config, "spec": prepared.spec}}
    for name, a in export_state_dict(ckpt).items():
        a = np.asarray(a, np.float64)
        s = stats.setdefault(name, {{"shape": list(a.shape), "std": [],
                                     "absmax": [], "mean": []}})
        s["std"].append(float(a.std(ddof=1)) if a.size > 1 else 0.0)
        s["absmax"].append(float(np.abs(a).max()))
        s["mean"].append(float(a.mean()))
json.dump({{n: {{"shape": s["shape"],
                 "std": sum(s["std"]) / len(s["std"]),
                 "absmax": max(s["absmax"]),
                 "mean": sum(s["mean"]) / len(s["mean"])}}
            for n, s in stats.items()}}, open(out, "w"))
'''


def _run_side(code, root, out, seeds):
    script = tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False)
    script.write(code.format(repo=REPO))
    script.close()
    env = dict(os.environ, CUDA_VISIBLE_DEVICES="")
    r = subprocess.run([sys.executable, script.name, root, out, str(seeds)],
                       capture_output=True, text=True, timeout=1200, env=env)
    os.unlink(script.name)
    if r.returncode != 0:
        raise RuntimeError(f"side failed:\n{r.stdout[-800:]}\n"
                           f"{r.stderr[-2000:]}")
    return json.load(open(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None)
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--rel_tol", type=float, default=0.15)
    args = ap.parse_args()

    root = args.root
    if root is None:
        from train_equivalence import build_world

        root = tempfile.mkdtemp(prefix="init_audit_")
        build_world(root)

    with tempfile.TemporaryDirectory() as td:
        ref = _run_side(_REF_SIDE, root, os.path.join(td, "ref.json"),
                        args.seeds)
        ours = _run_side(_OURS_SIDE, root, os.path.join(td, "ours.json"),
                         args.seeds)

    bad = []
    only_ref = [n for n in ref if n not in ours]
    only_ours = [n for n in ours if n not in ref]
    for n in only_ref:
        if not any(b in n for b in BENIGN_REF_ONLY):
            bad.append(f"missing from ours: {n}")
    for n in only_ours:
        if not n.endswith(BENIGN_OURS_ONLY):
            bad.append(f"extra in ours: {n}")

    print(f"{'param':58s} {'ref_std':>8s} {'our_std':>8s} "
          f"{'ref_amax':>8s} {'our_amax':>8s}")
    for n in sorted(set(ref) & set(ours)):
        r, o = ref[n], ours[n]
        flag = ""
        if r["shape"] != o["shape"]:
            flag = "  SHAPE"
            bad.append(f"shape mismatch: {n} {r['shape']} vs {o['shape']}")
        hi = max(r["std"], o["std"])
        # the std ESTIMATE itself has ~1/sqrt(2(N-1)) relative sd for N
        # samples; widen the tolerance for tiny tensors x few seeds so a
        # (1, 8) weight at 4 seeds (N=32) doesn't false-positive
        n_samples = max(
            2, int(np.prod(r["shape"]) if r["shape"] else 1) * args.seeds)
        tol = max(args.rel_tol, 4.0 / (2.0 * (n_samples - 1)) ** 0.5)
        if hi > 1e-9 and abs(r["std"] - o["std"]) / hi > tol:
            flag += "  STD-MISMATCH"
            bad.append(f"std mismatch: {n} ref {r['std']:.4f} "
                       f"vs ours {o['std']:.4f}")
        print(f"{n:58s} {r['std']:8.4f} {o['std']:8.4f} "
              f"{r['absmax']:8.4f} {o['absmax']:8.4f}{flag}")

    print(f"\nmatched {len(set(ref) & set(ours))} params; "
          f"benign ref-only {len(only_ref)}, benign ours-only "
          f"{len(only_ours)}; findings: {len(bad)}")
    for b in bad:
        print("  !!", b)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
