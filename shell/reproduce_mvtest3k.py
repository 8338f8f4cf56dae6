#!/usr/bin/env python3
"""MV-test3k R@1-parity reproduction: the day the real MSR-VTT feature
dumps exist under <rootpath>, parity vs the published reference numbers is
ONE command:

    python shell/reproduce_mvtest3k.py --model both

Runs the headline configs (reference shell/do_laff_mvtest3k.sh:23 and
shell/do_laffml_mvtest3k.sh:14,24), collects the t2v metrics, and diffs
them against BASELINE.md (reference README.md:48-49). Exits nonzero when
R@1 is outside the ±0.2 north-star band or R@10 / MedR miss parity.

``--dry_run`` proves the plumbing on a synthetic mirror world (tiny dims,
tiny config) with no real data — train -> predict -> TSV -> diff harness.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference README.md:48-49 via BASELINE.md
BASELINES = {
    "laff": {"config": "laff", "parm": "0_12_0_12_0_0_1",
             "r1": 28.0, "r10": 64.9, "medr": 4},
    "laffml": {"config": "FrameLaff_NoFrameFc_StrongCLIP_adjust",
               "parm": "0_7_1_12_0_12_0",
               "r1": 29.1, "r10": 65.8, "medr": 4},
}
R1_TOL = 0.2   # BASELINE.json north star
R10_TOL = 0.5
COLLECTIONS = ("msrvtt10ktrain", "msrvtt10kval", "msrvtt10ktest")
NEEDED_FEATURES = ("clip_ft", "timesformer", "x3d", "ircsn")


def check_data(rootpath):
    missing = []
    for coll in COLLECTIONS:
        cdir = os.path.join(rootpath, coll)
        if not os.path.isdir(cdir):
            missing.append(cdir)
            continue
        for feat in NEEDED_FEATURES:
            d = os.path.join(cdir, "FeatureData", feat)
            if not os.path.isdir(d):
                missing.append(d)
        cap = os.path.join(cdir, "TextData", f"{coll}.caption.txt")
        if not os.path.exists(cap):
            missing.append(cap)
    w2v = os.path.join(rootpath, "word2vec", "flickr", "vec500flickr30m")
    if not os.path.isdir(w2v):
        missing.append(w2v)
    return missing


def run_model(name, rootpath, num_epochs, seed, batch_size,
              train="msrvtt10ktrain", val="msrvtt10kval",
              test="msrvtt10ktest", config=None, parm=None):
    from laff_tpu.engine.orchestrate import SweepOptions, retrieval_task

    base = BASELINES.get(name, {})
    sweep = SweepOptions(
        trainCollection=train, valCollection=val, testCollection=test,
        rootpath=rootpath, val_set="no",
        config_name=config or base["config"],
        parm_adjust_configs=[parm or base["parm"]],
        random_seeds=[seed], batch_size=batch_size, num_epochs=num_epochs,
        model_prefix_base="repro_",
    )
    results = retrieval_task(sweep)
    run = results[next(iter(results))]
    # model_best prediction, first query set's t2v tuple
    qset = next(iter(run["predict"].values()))
    return qset["t2v"]


def diff_against_baseline(name, t2v):
    base = BASELINES[name]
    r1, _, r10, medr = t2v[0], t2v[1], t2v[2], t2v[3]
    rows = {
        "r1": (r1, base["r1"], abs(r1 - base["r1"]) <= R1_TOL),
        "r10": (r10, base["r10"], abs(r10 - base["r10"]) <= R10_TOL),
        "medr": (medr, base["medr"], int(medr) == int(base["medr"])),
    }
    ok = all(v[2] for v in rows.values())
    print(json.dumps({
        "model": name,
        **{k: {"ours": v[0], "reference": v[1], "pass": v[2]}
           for k, v in rows.items()},
        "parity": ok,
    }))
    return ok


def dry_run():
    """Synthetic mirror world: same script path, tiny config/dims. Runs on
    CPU — it checks plumbing, not performance (note: the axon TPU plugin
    overrides JAX_PLATFORMS, so force through jax.config pre-init)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from laff_tpu.data.synth import build_collection, build_w2v

    root = tempfile.mkdtemp(prefix="repro_dry_")
    for coll, n, seed in (("msrvtt10ktrain", 32, 0), ("msrvtt10kval", 16, 5),
                          ("msrvtt10ktest", 20, 9)):
        build_collection(root, coll, n_videos=n, caps_per_video=2, seed=seed)
    build_w2v(root)
    t2v = run_model("dry", root, num_epochs=4, seed=2, batch_size=16,
                    config="tiny", parm="None")
    ok = all(map(lambda x: x == x and x >= 0, t2v))  # finite, sane
    print(json.dumps({"model": "dry_run", "t2v": [float(x) for x in t2v],
                      "plumbing": "ok" if ok else "FAILED"}))
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rootpath", default=os.path.expanduser("~/VisualSearch"))
    p.add_argument("--model", choices=["laff", "laffml", "both"],
                   default="both")
    p.add_argument("--num_epochs", type=int, default=80)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args(argv)

    if args.dry_run:
        return dry_run()

    missing = check_data(args.rootpath)
    if missing:
        print("missing data (get MSR-VTT dumps per the reference README):")
        for m in missing:
            print(f"  {m}")
        return 2

    names = ["laff", "laffml"] if args.model == "both" else [args.model]
    ok = True
    for name in names:
        t2v = run_model(name, args.rootpath, args.num_epochs, args.seed,
                        args.batch_size)
        ok &= diff_against_baseline(name, t2v)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
