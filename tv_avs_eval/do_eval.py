#!/usr/bin/env python3
"""One-shot AVS scoring chain: score file -> XML -> infAP (replaces
``tv_avs_eval/do_eval.sh`` + ``do_txt2xml.sh``).

Usage mirrors the reference shell (do_eval.sh:8-22):
  python tv_avs_eval/do_eval.py <testCollection> <topic_set> <sim_name> \
      [--rootpath R] [--overwrite 0] [--use_perl 0]

Resolves the predictor's dump at
``<root>/<collection>/SimilarityIndex/<topic_set>.avs.txt/<sim_name>/
id.sent.score.txt``, converts it to NIST submission XML (priority 1,
etime 1.0 — do_txt2xml.sh defaults), and prints the infAP.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import trec_eval
import txt2xml

from laff_tpu.utils import ROOT_PATH


def main(argv=None):
    parser = argparse.ArgumentParser("AVS score file -> XML -> infAP")
    parser.add_argument("testCollection")
    parser.add_argument("topic_set", help="TRECVID edition, e.g. tv18")
    parser.add_argument("sim_name", help="run directory under "
                        "SimilarityIndex/<topic_set>.avs.txt/")
    parser.add_argument("--rootpath", default=ROOT_PATH)
    parser.add_argument("--overwrite", type=int, default=0)
    parser.add_argument("--use_perl", type=int, default=0)
    args = parser.parse_args(argv)

    rootpath = os.path.expanduser(args.rootpath)
    score_file = os.path.join(
        rootpath, args.testCollection, "SimilarityIndex",
        f"{args.topic_set}.avs.txt", args.sim_name, "id.sent.score.txt"
    )
    print(score_file)
    if not os.path.exists(score_file):
        print(f"score file not found: {score_file}", file=sys.stderr)
        return 1

    rc = txt2xml.main([
        args.testCollection, score_file, "--edition", args.topic_set,
        "--priority", "1", "--etime", "1.0",
        "--desc", "This run uses the top secret x-component",
        "--rootpath", rootpath, "--overwrite", str(args.overwrite),
    ])
    if rc:
        return rc
    return trec_eval.main([
        score_file + ".xml", "--rootpath", rootpath,
        "--collection", args.testCollection, "--edition", args.topic_set,
        "--overwrite", str(args.overwrite),
        "--use_perl", str(args.use_perl),
    ])


if __name__ == "__main__":
    sys.exit(main())
