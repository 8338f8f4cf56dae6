#!/usr/bin/env python3
"""Prediction CLI — argument surface mirrors the reference
``do_predictor.py``/``predictor.parse_args``."""

import argparse
import sys

from laff_tpu.engine.predictor import PredictOptions, main as predict_main
from laff_tpu.utils import ROOT_PATH


def parse_args(argv=None):
    parser = argparse.ArgumentParser("LAFF-TPU predictor")
    parser.add_argument("testCollection", type=str)
    parser.add_argument("model_path", type=str, help="checkpoint to load")
    parser.add_argument("sim_name", type=str,
                        help="sub-folder where computed similarities are saved")
    parser.add_argument("--rootpath", type=str, default=ROOT_PATH)
    parser.add_argument("--overwrite", type=int, default=0, choices=[0, 1])
    parser.add_argument("--query_sets", type=str, default="tv16.avs.txt")
    parser.add_argument("--predict_result_file", type=str,
                        default="result_log/result_test.txt")
    parser.add_argument("--batch_size", default=1024, type=int)
    parser.add_argument("--num_workers", default=0, type=int,
                        help="embedder prefetch depth (batches in flight)")
    parser.add_argument("--device", default="0", type=str,
                        help="accepted for CLI parity; device selection is JAX-managed")
    parser.add_argument("--adjust_weight_predict", type=int, default=0,
                        choices=[0, 1],
                        help="accepted for CLI parity; parsed but never "
                             "read by the reference either (predictor.py:44 "
                             "is its only occurrence — and its type=bool "
                             "there makes any explicit value truthy)")
    parser.add_argument("--task3_caption", type=str, default="no_task3_caption",
                        help="any other value enables boolean negation "
                             "scoring of the queries (predictneg)")
    parser.add_argument("--neg_method", type=str, default="sub",
                        choices=["sub", "mul"],
                        help="negation score adjustment method")
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="shard eval batches over an N-device mesh "
                             "(batch_size must divide by N)")
    parser.add_argument("--each_head", type=int, default=0, choices=[0, 1],
                        help="also dump per-space (per-head) metrics")
    parser.add_argument("--int8_gallery", type=int, default=0, choices=[0, 1],
                        help="large AVS galleries: int8 HBM nomination + "
                             "exact candidate re-embedding (2x shots/chip)")
    parser.add_argument("--rerank", type=str, default="none",
                        choices=["none", "kreciprocal", "tkb", "concept"],
                        help="post-processing re-ranking of the score matrix")
    parser.add_argument("--concept_pkl", type=str, default="",
                        help="video<->concept CLIP sim pkl (rerank=concept)")
    parser.add_argument("--concept_weight", type=float, default=2.0)
    parser.add_argument("--concept_topk", type=int, default=1000)
    parser.add_argument("--concept_bow_counts", type=str, default="",
                        help="vocab count file ('word count' per line) for idf")
    parser.add_argument("--concept_caption", type=str, default="",
                        help="caption file for idf substring-count fallback")
    args = parser.parse_args(argv)
    return PredictOptions(**vars(args))


def main(argv=None):
    predict_main(parse_args(argv))
    return 0


if __name__ == "__main__":
    sys.exit(main())
