"""TRECVID AVS harness: xinfAP scorer vs the official NIST Perl tool,
XML/treceval format round-trips."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from laff_tpu.eval.trecvid import (
    evaluate_xml,
    parse_infap,
    sample_eval,
    scores_to_xml,
    xml_to_treceval,
)
from laff_tpu.eval.trecvid.infap import format_report

# the NIST scorer is vendored (laff_tpu/eval/trecvid/sample_eval.pl) so the
# official-scorer path works in a standalone deployment; the parity test
# runs against the vendored copy and needs only perl itself
VENDORED_PERL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "laff_tpu", "eval", "trecvid", "sample_eval.pl")
HAVE_PERL = shutil.which("perl") is not None and os.path.exists(VENDORED_PERL)


def synth_qrels_and_run(tmp_path, rng, n_topics=3, n_docs=400, topk=200):
    """Stratified qrels: stratum A = depth-100 pool fully judged, stratum B
    sampled (some rel=-1 unjudged pool members)."""
    qrels_lines = []
    run_lines = []
    topics = [str(1000 + t) for t in range(n_topics)]
    for t, topic in enumerate(topics):
        docs = [f"shot{t}_{i}" for i in range(n_docs)]
        for i, d in enumerate(docs):
            stratum = "1" if i < 100 else "2"
            if stratum == "1":
                rel = int(rng.random() < 0.3) * int(rng.integers(1, 3))
            else:
                u = rng.random()
                rel = -1 if u < 0.5 else (int(u > 0.85) * int(rng.integers(1, 3)))
            qrels_lines.append(f"{topic} 0 {d} {stratum} {rel}")
        # run: random scores over a subset
        chosen = rng.permutation(n_docs)[:topk]
        scores = np.sort(rng.random(topk))[::-1]
        for rank, (ci, sc) in enumerate(zip(chosen, scores)):
            run_lines.append(f"{topic} 0 {docs[ci]} {rank+1} {sc:.6f} TEAM")

    qrels = str(tmp_path / "qrels.txt")
    run = str(tmp_path / "run.treceval")
    open(qrels, "w").write("\n".join(qrels_lines) + "\n")
    open(run, "w").write("\n".join(run_lines) + "\n")
    return qrels, run, topics


def test_sample_eval_basic(tmp_path, rng):
    qrels, run, topics = synth_qrels_and_run(tmp_path, rng)
    results = sample_eval(qrels, run)
    assert set(topics) <= set(results)
    allm = results["all"]
    assert 0 <= allm["infAP"] <= 1
    assert 0 <= allm["infNDCG"] <= 1.5
    report = format_report(results)
    assert parse_infap(report) == pytest.approx(allm["infAP"], abs=1e-4)


def test_perfect_run_high_infap(tmp_path):
    """A run returning exactly the relevant docs first scores ~1."""
    qrels_lines, run_lines = [], []
    docs = [f"d{i}" for i in range(100)]
    rel_docs = docs[:20]
    for d in docs:
        qrels_lines.append(f"1001 0 {d} 1 {1 if d in rel_docs else 0}")
    ranked = rel_docs + docs[20:]
    for rank, d in enumerate(ranked):
        run_lines.append(f"1001 0 {d} {rank+1} {1000-rank} TEAM")
    qrels = str(tmp_path / "q.txt")
    run = str(tmp_path / "r.txt")
    open(qrels, "w").write("\n".join(qrels_lines))
    open(run, "w").write("\n".join(run_lines))
    results = sample_eval(qrels, run)
    assert results["all"]["infAP"] > 0.95
    np.testing.assert_allclose(results["1001"]["inum_rel"], 20)


@pytest.mark.skipif(not HAVE_PERL, reason="perl or NIST script unavailable")
def test_python_scorer_matches_nist_perl(tmp_path, rng):
    """Bit-level parity with the official sample_eval.pl."""
    qrels, run, topics = synth_qrels_and_run(tmp_path, rng, n_topics=4)
    ours = sample_eval(qrels, run)

    out = subprocess.run(
        ["perl", VENDORED_PERL, "-q", qrels, run],
        capture_output=True, text=True, cwd=str(tmp_path), check=True,
    ).stdout

    perl_vals = {}
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 3 and parts[0] in ("infAP", "infNDCG", "iP10", "iP100",
                                            "iP1000", "inum_rel_ret"):
            perl_vals[(parts[0], parts[1])] = float(parts[-1])

    for topic in topics + ["all"]:
        for metric in ("infAP", "infNDCG", "iP10", "iP100", "iP1000"):
            key = (metric, topic)
            if key in perl_vals:
                assert ours[topic][metric] == pytest.approx(
                    perl_vals[key], abs=2e-4
                ), (topic, metric)


def test_txt2xml_and_treceval_roundtrip(tmp_path):
    # ranking file: 2 topics x 5 shots with descending scores
    lines = []
    for t in ("611", "612"):
        pairs = " ".join(f"shot_{t}_{i} {0.9 - 0.1*i:.3f}" for i in range(5))
        lines.append(f"{t} {pairs}")
    txt = str(tmp_path / "id.sent.score.txt")
    open(txt, "w").write("\n".join(lines))

    xml = scores_to_xml(txt, overwrite=True, topk=1000)
    content = open(xml).read()
    assert 'tNum="611"' in content and 'seqNum="5"' in content
    assert "videoAdhocSearchRunResult" in content

    treceval = xml_to_treceval(xml, overwrite=True)
    rows = open(treceval).read().strip().split("\n")
    assert len(rows) == 10
    assert rows[0].split() == ["1611", "0", "shot_611_0", "1", "9999", "RUCMM"]


def test_evaluate_xml_end_to_end(tmp_path):
    lines = []
    qrels_lines = []
    for t in ("611",):
        shots = [f"s{i}" for i in range(10)]
        pairs = " ".join(f"{s} {0.9 - 0.05*i:.3f}" for i, s in enumerate(shots))
        lines.append(f"{t} {pairs}")
        for i, s in enumerate(shots):
            qrels_lines.append(f"1{t} 0 {s} 1 {1 if i < 3 else 0}")
    txt = str(tmp_path / "id.sent.score.txt")
    open(txt, "w").write("\n".join(lines))
    qrels = str(tmp_path / "qrels.txt")
    open(qrels, "w").write("\n".join(qrels_lines))

    xml = scores_to_xml(txt, overwrite=True)
    inf_ap = evaluate_xml(xml, qrels, overwrite=True)
    assert inf_ap > 0.95  # top-3 are the relevant ones
    assert os.path.exists(xml + "_perf.txt")


def test_do_eval_cli_chain(tmp_path):
    """tv_avs_eval/do_eval.py resolves the predictor's dump layout and runs
    the full score->XML->infAP chain (reference do_eval.sh:8-22)."""
    import subprocess
    import sys

    root = str(tmp_path)
    sim_dir = os.path.join(root, "toyavs", "SimilarityIndex", "tv18.avs.txt",
                           "runs_demo")
    os.makedirs(sim_dir)
    os.makedirs(os.path.join(root, "toyavs", "TextData"))
    lines, qrels_lines = [], []
    for t in ("611",):
        shots = [f"s{i}" for i in range(10)]
        pairs = " ".join(f"{s} {0.9 - 0.05*i:.3f}" for i, s in enumerate(shots))
        lines.append(f"{t} {pairs}")
        for i, s in enumerate(shots):
            qrels_lines.append(f"1{t} 0 {s} 1 {1 if i < 3 else 0}")
    open(os.path.join(sim_dir, "id.sent.score.txt"), "w").write(
        "\n".join(lines))
    open(os.path.join(root, "toyavs", "TextData", "avs.qrels.tv18"),
         "w").write("\n".join(qrels_lines))

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tv_avs_eval", "do_eval.py")
    out = subprocess.run(
        [sys.executable, script, "toyavs", "tv18", "runs_demo",
         "--rootpath", root, "--overwrite", "1"],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PYTHONPATH=os.path.dirname(script) + os.pathsep
                 + os.path.dirname(os.path.dirname(script))),
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "tv18 infAP" in out.stdout
    assert os.path.exists(os.path.join(sim_dir, "id.sent.score.txt.xml"))
