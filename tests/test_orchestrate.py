"""Sweep orchestration: retrieval_task and AVS mode with the full
txt2xml -> xinfAP chain on a synthetic AVS world."""

import os

import numpy as np
import pytest

from laff_tpu.engine.orchestrate import SweepOptions, avs_task, retrieval_task

from helpers import build_collection, build_w2v


@pytest.fixture
def sweep_world(tmp_path):
    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=24, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=12, caps_per_video=1, seed=5)
    build_collection(root, "toytest", n_videos=20, caps_per_video=1, seed=9)
    build_w2v(root)
    return root


def test_retrieval_task_sweep(sweep_world):
    sweep = SweepOptions(
        trainCollection="toytrain", valCollection="toyval",
        testCollection="toytest", rootpath=sweep_world, config_name="tiny",
        parm_adjust_configs=["None"], random_seeds=[2], val_set="no",
        batch_size=12, num_epochs=2, overwrite=1,
        result_file=os.path.join(sweep_world, "result_log", "sweep.txt"),
    )
    results = retrieval_task(sweep)
    key = "runs_None_seed_2"
    assert key in results
    assert "t2v" in results[key]["predict"]["toytest.caption.txt"]


def test_avs_task_end_to_end(sweep_world, monkeypatch):
    """Full AVS chain: train -> score file -> XML -> treceval -> infAP."""
    import laff_tpu.engine.predictor as P

    monkeypatch.setattr(P, "AVS_COLLECTIONS", ("toytest",))

    # topics + qrels for a tiny 'edition'
    tdir = os.path.join(sweep_world, "toytest", "TextData")
    with open(os.path.join(tdir, "tv99.avs.txt"), "w") as fh:
        for i in range(4):
            fh.write(f"9{i:02d} synthetic topic {i}\n")
    # captions file named like a query set; reuse topic ids as txt ids
    with open(os.path.join(tdir, "tv99.queries.txt"), "w") as fh:
        from helpers import WORDS

        for i in range(4):
            fh.write(f"9{i:02d} the {' '.join(WORDS[i:i+4])}\n")
    rng = np.random.default_rng(0)
    with open(os.path.join(tdir, "avs.qrels.tv99"), "w") as fh:
        for i in range(4):
            for v in range(20):
                rel = int(rng.random() < 0.3)
                fh.write(f"19{i:02d} 0 video{v} 1 {rel}\n")

    sweep = SweepOptions(
        trainCollection="toytrain", valCollection="toyval",
        testCollection="toytest", rootpath=sweep_world, config_name="tiny",
        parm_adjust_configs=["None"], random_seeds=[2], val_set="no",
        batch_size=12, num_epochs=2, overwrite=1,
        result_file=os.path.join(sweep_world, "result_log", "avs.txt"),
        avs_query_sets="tv99.queries.txt",
        avs_editions=["tv99"],
    )
    # map the query-set name to the tv99 edition (edition = prefix before '.')
    results = avs_task(sweep)
    key = "runs_None_seed_2"
    score_file = results[key]["predict"]["tv99.queries.txt"]["score_file"]
    assert os.path.exists(score_file)
    assert "tv99" in results[key]["infAP"]
    assert 0.0 <= results[key]["infAP"]["tv99"] <= 1.0
    assert os.path.exists(score_file + ".xml")

    # the vendored NIST Perl scorer (official path) agrees with the Python
    # xinfAP on the produced submission
    import shutil as _shutil

    if _shutil.which("perl"):
        from laff_tpu.eval.trecvid import evaluate_xml

        qrels = os.path.join(sweep_world, "toytest", "TextData",
                             "avs.qrels.tv99")
        perl_ap = evaluate_xml(score_file + ".xml", qrels, overwrite=True,
                               use_perl=True)
        np.testing.assert_allclose(perl_ap, results[key]["infAP"]["tv99"],
                                   atol=2e-4)


def test_two_stage_pretrain_finetune_avs(sweep_world, monkeypatch):
    """shell/do_pretrain_gcc_train_avs.py end to end on a synthetic world:
    stage-1 subset pretrain (no val collection) -> stage-2 fine-tune from
    the pretrained checkpoint -> AVS scoring (reference
    do_pretrain_gcc_train_avs.sh:56-93)."""
    import sys

    import laff_tpu.engine.predictor as P

    monkeypatch.setattr(P, "AVS_COLLECTIONS", ("toytest",))
    build_collection(sweep_world, "gcctoy", n_videos=24, caps_per_video=2,
                     seed=11)
    tdir = os.path.join(sweep_world, "toytest", "TextData")
    with open(os.path.join(tdir, "tv99.queries.txt"), "w") as fh:
        from helpers import WORDS

        for i in range(3):
            fh.write(f"9{i:02d} the {' '.join(WORDS[i:i+4])}\n")
    rng = np.random.default_rng(0)
    with open(os.path.join(tdir, "avs.qrels.tv99"), "w") as fh:
        for i in range(3):
            for v in range(20):
                fh.write(f"19{i:02d} 0 video{v} 1 {int(rng.random() < 0.3)}\n")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "shell"))
    import do_pretrain_gcc_train_avs as two_stage

    rc = two_stage.main([
        "--rootpath", sweep_world, "--pretrainCollection", "gcctoy",
        "--trainCollection", "toytrain", "--valCollection", "toyval",
        "--val_set", "no", "--testCollection", "toytest",
        "--config", "tiny", "--batch_size", "12",
        "--pretrain_epochs", "2", "--num_epochs", "2",
        "--avs_query_sets", "tv99.queries.txt", "--avs_editions", "tv99",
    ])
    assert rc == 0
    # stage-1 checkpoint exists and stage 2 consumed it
    pre = os.path.join(sweep_world, "gcctoy", "w2vvpp_train", "gcc11val",
                       "tiny", "gcc_pretrain_None_seed_2",
                       "model_best.pth.tar")
    assert os.path.exists(pre)
    ft_dir = os.path.join(sweep_world, "toytrain", "w2vvpp_train", "toyval",
                          "tiny")
    runs = [d for d in os.listdir(ft_dir) if d.startswith("gccft_")]
    assert runs, os.listdir(ft_dir)
    # sim_name layout: <train>/<val>/<config> (avs_task's sim naming)
    score = os.path.join(sweep_world, "toytest", "SimilarityIndex",
                         "tv99.queries.txt", "toytrain", "toyval", "tiny",
                         "id.sent.score.txt")
    assert os.path.exists(score)
    assert os.path.exists(score + ".xml")


def test_avs_task_scores_every_checkpoint(sweep_world, monkeypatch):
    """Editions x {model_best, mean_last10}: every requested checkpoint goes
    through the score -> XML -> infAP chain (reference avs_task.sh:169-259
    loops both)."""
    import shutil

    import laff_tpu.engine.predictor as P

    monkeypatch.setattr(P, "AVS_COLLECTIONS", ("toytest",))
    tdir = os.path.join(sweep_world, "toytest", "TextData")
    with open(os.path.join(tdir, "tv98.queries.txt"), "w") as fh:
        from helpers import WORDS

        for i in range(3):
            fh.write(f"8{i:02d} the {' '.join(WORDS[i:i+4])}\n")
    rng = np.random.default_rng(1)
    with open(os.path.join(tdir, "avs.qrels.tv98"), "w") as fh:
        for i in range(3):
            for v in range(20):
                fh.write(f"18{i:02d} 0 video{v} 1 {int(rng.random() < 0.3)}\n")

    sweep = SweepOptions(
        trainCollection="toytrain", valCollection="toyval",
        testCollection="toytest", rootpath=sweep_world, config_name="tiny",
        parm_adjust_configs=["None"], random_seeds=[2], val_set="no",
        batch_size=12, num_epochs=2, overwrite=1,
        result_file=os.path.join(sweep_world, "result_log", "avs2.txt"),
        avs_query_sets="tv98.queries.txt",
        avs_editions=["tv98"],
        checkpoints=["model_best.pth.tar", "mean_last10.pth.tar"],
    )
    # a 2-epoch improving run never writes mean_last10; materialize one (a
    # valid checkpoint) so both loop arms execute deterministically
    from laff_tpu.engine.orchestrate import Options as _O  # noqa: N814
    from laff_tpu.engine.prepare import model_dir_for

    opt = _O(trainCollection="toytrain", valCollection="toyval",
             rootpath=sweep_world, val_set="no", config_name="tiny",
             model_prefix="runs_None_seed_2")
    from laff_tpu.engine import trainer as T

    topt = _O(trainCollection="toytrain", valCollection="toyval",
              rootpath=sweep_world, val_set="no", config_name="tiny",
              num_epochs=2, batch_size=12, model_prefix="runs_None_seed_2",
              overwrite=1)
    T.main(topt)
    mdir = model_dir_for(opt)
    shutil.copy(os.path.join(mdir, "model_best.pth.tar"),
                os.path.join(mdir, "mean_last10.pth.tar"))
    sweep.overwrite = 0  # reuse the trained model; still rescores

    results = avs_task(sweep)
    all_aps = results["runs_None_seed_2"]["infAP_all"]
    assert set(all_aps) == {"model_best", "mean_last10"}
    for tag in ("model_best", "mean_last10"):
        assert "tv98" in all_aps[tag], all_aps
        assert 0.0 <= all_aps[tag]["tv98"] <= 1.0
    # identical weights => identical infAP through both chains
    np.testing.assert_allclose(all_aps["model_best"]["tv98"],
                               all_aps["mean_last10"]["tv98"], atol=1e-9)


def test_reproduce_mvtest3k_dry_run():
    """The R@1-parity reproduction script's plumbing stays green: synthetic
    mirror world -> headline-shaped train -> predict -> metric diff harness."""
    import importlib.util
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "shell", "reproduce_mvtest3k.py")
    out = subprocess.run(
        [sys.executable, script, "--dry_run"],
        capture_output=True, text=True, timeout=500,
    )
    assert out.returncode == 0, out.stderr[-800:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    blob = json.loads(line)
    assert blob["plumbing"] == "ok"

    # missing-data path exits 2 with a listing
    out2 = subprocess.run(
        [sys.executable, script, "--rootpath", "/tmp/definitely_missing_xyz"],
        capture_output=True, text=True, timeout=120,
    )
    assert out2.returncode == 2
    assert "missing data" in out2.stdout


def test_retrieval_task_parallel_jobs(tmp_path):
    """--jobs N fans (seed x parm) combos out to subprocesses (the
    reference shell's PID-queue pool, retrieval_task.sh:17-45)."""
    import subprocess
    import sys

    from helpers import build_collection, build_w2v

    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=24, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=12, caps_per_video=1, seed=5)
    build_collection(root, "toytest", n_videos=12, caps_per_video=1, seed=9)
    build_w2v(root)
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "shell", "retrieval_task.py")
    env = dict(os.environ)
    # JAX_PLATFORMS alone is overridden by TPU plugins; the driver honors
    # this explicit escape hatch through jax.config
    env["LAFF_TPU_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, script, "--rootpath", root,
         "--trainCollection", "toytrain", "--valCollection", "toyval",
         "--testCollection", "toytest", "--config", "tiny",
         "--random_seeds", "2,3", "--num_epochs", "2", "--batch_size", "12",
         "--jobs", "2",
         "--result_file", os.path.join(root, "result_log", "par.txt")],
        capture_output=True, text=True, timeout=500, env=env,
    )
    assert out.returncode == 0, out.stderr[-800:]
    # both seeds produced checkpoints
    for seed in (2, 3):
        d = os.path.join(root, "toytrain", "w2vvpp_train", "toyval", "tiny",
                         f"runs_None_seed_{seed}")
        assert os.path.exists(os.path.join(d, "model_best.pth.tar")), d


def test_all_run_multi_dataset(tmp_path):
    """shell/all_run.py loops dataset triples through retrieval_task
    (reference laff_AllRun.sh:31-45), appending to one result file."""
    import sys

    from helpers import build_collection, build_w2v

    root = str(tmp_path)
    for name, n in (("dsAtrain", 24), ("dsAval", 12), ("dsAtest", 12),
                    ("dsBtrain", 24), ("dsBval", 12), ("dsBtest", 12)):
        build_collection(root, name, n_videos=n, caps_per_video=2, seed=hash(name) % 100)
    build_w2v(root)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "shell"))
    import all_run

    result_file = os.path.join(root, "result_log", "allrun.txt")
    rc = all_run.main([
        "--rootpath", root,
        "--datasets", "dsAtrain:dsAval:dsAtest,dsBtrain:dsBval:dsBtest",
        "--config", "tiny", "--parm_adjust_configs", "None",
        "--num_epochs", "2", "--batch_size", "12",
        "--result_file", result_file,
    ])
    assert rc == 0
    for train, val in (("dsAtrain", "dsAval"), ("dsBtrain", "dsBval")):
        d = os.path.join(root, train, "w2vvpp_train", val, "tiny",
                         "runs_None_seed_2")
        assert os.path.exists(os.path.join(d, "model_best.pth.tar")), d
    t2v_log = os.path.join(root, "result_log", "TextToVideo", "allrun.txt")
    rows = open(t2v_log).read().strip().split("\n")
    assert len(rows) >= 2  # one appended metric row per dataset


def test_retrieval_task_batch_seeds(sweep_world):
    """--batch_seeds pre-trains all seeds of a parm config in one fused
    program; the per-seed loop then predicts from the sweep-written
    checkpoints (training skipped)."""
    sweep = SweepOptions(
        trainCollection="toytrain", valCollection="toyval",
        testCollection="toytest", rootpath=sweep_world, config_name="tiny",
        parm_adjust_configs=["None"], random_seeds=[2, 7], val_set="no",
        batch_size=12, num_epochs=2, overwrite=1,
        result_file=os.path.join(sweep_world, "result_log", "bs.txt"),
        batch_seeds=True,
    )
    results = retrieval_task(sweep)
    for seed in (2, 7):
        key = f"runs_None_seed_{seed}"
        assert key in results
        # training happened in the fused sweep; the loop found the
        # checkpoint and skipped to prediction
        assert results[key]["train"].get("skipped") is True
        assert "t2v" in results[key]["predict"]["toytest.caption.txt"]
