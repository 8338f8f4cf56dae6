#!/usr/bin/env python3
"""Powered-up level-3 (from-scratch) training-equivalence sweep.

VERDICT r3 item 2: the round-3 from-scratch comparison (n=12 per stack,
seed sd ~0.09) could hide a deficit of half a seed-sd. This driver runs
BOTH stacks from their own initializers on one shared synthetic world for
N seeds each (default 48), in parallel subprocesses, and reports:

- per-stack mean/sd of best validation mir,
- the Welch t and the 95% CI on the mean difference (ours - ref),
- a PASS/FAIL statement against the pre-registered criterion: the CI
  must exclude a deficit larger than HALF the pooled seed-sd (the
  resolution the round-3 verdict asked for; on the real MV-test3k
  benchmark seed noise is a fraction of an R@1 point, so a half-seed-sd
  deficit on this world is the rehearsal-scale analogue of the ±0.2-R@1
  north-star band, BASELINE.md).

Each run is a fresh subprocess (ref: shell/ref_train_driver.py executes
the UNMODIFIED reference trainer, /root/reference/trainer.py; ours:
laff_tpu.engine.trainer via train_equivalence.run_ours on the CPU
platform). Seeds control init AND shuffling in both stacks.

Usage:
    python shell/equivalence_scratch_sweep.py [--seeds 48] [--jobs 6]
        [--train_videos 48 --val_videos 24] [--epochs 30]
        [--out EQUIVALENCE_SCRATCH.json]
"""

import argparse
import json
import math
import os
import subprocess
import sys
import tempfile
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "shell"))


def run_ref_seed(root, seed, epochs, batch, lr, timeout=1800):
    out = os.path.join(root, f"ref_seed{seed}.json")
    cmd = [sys.executable, os.path.join(REPO, "shell", "ref_train_driver.py"),
           "--rootpath", root, "--train", "equivtrain", "--val", "equivval",
           "--epochs", str(epochs), "--batch_size", str(batch),
           "--lr", repr(lr), "--seed", str(seed), "--out", out,
           "--model_prefix", f"ref_scratch_s{seed}"]
    env = dict(os.environ, JAX_PLATFORMS="cpu", CUDA_VISIBLE_DEVICES="")
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                       env=env)
    if r.returncode != 0:
        raise RuntimeError(f"ref seed {seed} rc={r.returncode}:\n"
                           f"{r.stdout[-1000:]}\n{r.stderr[-2000:]}")
    with open(out) as fh:
        return json.load(fh)["best_perf"]


def run_ours_seed(root, seed, epochs, batch, lr, timeout=1800):
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {REPO!r}); "
        f"sys.path.insert(0, {os.path.join(REPO, 'shell')!r})\n"
        "from train_equivalence import run_ours\n"
        f"r = run_ours({root!r}, {epochs}, {batch}, {lr}, {seed})\n"
        "import json; print('BEST ' + json.dumps(r['best_perf']))\n"
    )
    env = dict(os.environ, CUDA_VISIBLE_DEVICES="")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"ours seed {seed} rc={r.returncode}:\n"
                           f"{r.stdout[-1000:]}\n{r.stderr[-2000:]}")
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("BEST ")][-1]
    return json.loads(line[5:])


def mean_sd(xs):
    m = sum(xs) / len(xs)
    if len(xs) < 2:  # --seeds 1 smoke runs: no spread estimate
        return m, float("nan")
    var = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
    return m, math.sqrt(var)


def welch(a, b):
    """Welch t, dof, and 95% CI on mean(a) - mean(b)."""
    ma, sa = mean_sd(a)
    mb, sb = mean_sd(b)
    na, nb = len(a), len(b)
    if na < 2 or nb < 2:  # smoke runs: no inference possible
        nan = float("nan")
        return {"t": nan, "dof": nan, "diff": ma - mb,
                "ci95": [nan, nan], "se": nan}
    se2 = sa * sa / na + sb * sb / nb
    se = math.sqrt(se2)
    t = (ma - mb) / se
    dof = se2 * se2 / (
        (sa * sa / na) ** 2 / (na - 1) + (sb * sb / nb) ** 2 / (nb - 1)
    )
    # two-sided 97.5% quantile of t_dof via a dense-enough table
    tq = t_975(dof)
    return {
        "t": t, "dof": dof, "diff": ma - mb,
        "ci95": [ma - mb - tq * se, ma - mb + tq * se], "se": se,
    }


def t_975(dof):
    table = [(1, 12.706), (2, 4.303), (3, 3.182), (4, 2.776), (5, 2.571),
             (6, 2.447), (8, 2.306), (10, 2.228), (12, 2.179), (15, 2.131),
             (20, 2.086), (25, 2.060), (30, 2.042), (40, 2.021), (60, 2.000),
             (80, 1.990), (120, 1.980), (1e9, 1.960)]
    for (d0, q0), (d1, q1) in zip(table, table[1:]):
        if dof <= d1:
            w = (dof - d0) / (d1 - d0)
            return q0 + w * (q1 - q0)
    return 1.960


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=48,
                    help="seeds PER STACK (seed values 2..2+N-1)")
    ap.add_argument("--jobs", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--train_videos", type=int, default=48)
    ap.add_argument("--val_videos", type=int, default=24)
    ap.add_argument("--feat_dims", default=None,
                    help="e.g. 'clip_ft:512,x3d:1024' (default: toy 16/12)")
    ap.add_argument("--latent_dim", type=int, default=5)
    ap.add_argument("--words", type=int, default=None,
                    help="word-pool size (default: the 18 stock words)")
    ap.add_argument("--noise", type=float, default=0.05,
                    help="absolute feature-noise sd (signal sd is "
                         "~2*sqrt(latent_dim); raise to pull the world off "
                         "the mir ceiling)")
    ap.add_argument("--root", default=None)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "EQUIVALENCE_SCRATCH.json"))
    args = ap.parse_args()

    from train_equivalence import build_world

    feat_dims = None
    if args.feat_dims:
        feat_dims = tuple(
            (n, int(d)) for n, d in
            (pair.split(":") for pair in args.feat_dims.split(",")))

    root = args.root or tempfile.mkdtemp(prefix="equiv_scratch_")
    if not os.path.isdir(os.path.join(root, "equivtrain")):
        build_world(root, n_train=args.train_videos, n_val=args.val_videos,
                    feat_dims=feat_dims, latent_dim=args.latent_dim,
                    n_words=args.words, noise=args.noise)
    print(f"world at {root} ({args.train_videos} train / "
          f"{args.val_videos} val videos, feat_dims={feat_dims or 'toy'}, "
          f"latent={args.latent_dim}, words={args.words or 18})", flush=True)

    seeds = list(range(2, 2 + args.seeds))
    jobs = []
    with ThreadPoolExecutor(max_workers=args.jobs) as ex:
        for s in seeds:
            jobs.append(("ref", s, ex.submit(
                run_ref_seed, root, s, args.epochs, args.batch_size, args.lr)))
            jobs.append(("ours", s, ex.submit(
                run_ours_seed, root, s, args.epochs, args.batch_size,
                args.lr)))
        results = {"ref": {}, "ours": {}}
        for stack, s, fut in jobs:
            results[stack][s] = fut.result()
            print(f"  {stack} seed {s}: {results[stack][s]:.4f}", flush=True)

    ref = [results["ref"][s] for s in seeds]
    ours = [results["ours"][s] for s in seeds]
    mr, sr = mean_sd(ref)
    mo, so = mean_sd(ours)
    w = welch(ours, ref)
    sd_pooled = math.sqrt((sr * sr + so * so) / 2)
    threshold = -0.5 * sd_pooled
    passed = w["ci95"][0] > threshold

    report = {
        "world": {"root": root, "train_videos": args.train_videos,
                  "val_videos": args.val_videos, "epochs": args.epochs,
                  "batch_size": args.batch_size, "lr": args.lr,
                  "feat_dims": list(feat_dims) if feat_dims
                  else [["clip_ft", 16], ["x3d", 12]],
                  "latent_dim": args.latent_dim,
                  "word_pool": args.words or 18, "noise": args.noise},
        "n_per_stack": args.seeds, "seeds": seeds,
        "ref": {"mean": mr, "sd": sr, "best_mir": ref},
        "ours": {"mean": mo, "sd": so, "best_mir": ours},
        "welch": w,
        "criterion": ("95% CI on mean(ours)-mean(ref) must exclude a "
                      "deficit larger than 0.5 x pooled seed-sd"),
        "threshold_deficit": threshold,
        "pass": passed,
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({
        "ref_mean": round(mr, 4), "ref_sd": round(sr, 4),
        "ours_mean": round(mo, 4), "ours_sd": round(so, 4),
        "diff": round(w["diff"], 4),
        "ci95": [round(x, 4) for x in w["ci95"]],
        "t": round(w["t"], 3), "dof": round(w["dof"], 1),
        "threshold_deficit": round(threshold, 4), "pass": passed,
    }, indent=1))
    print("full report:", args.out)
    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
