#!/usr/bin/env python3
"""LAFF on MSR-VTT (MV-test3k protocol) — the headline LAFF reproduction
(reference shell/do_laff_mvtest3k.sh)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from retrieval_task import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main([
        "--trainCollection", "msrvtt10ktrain",
        "--valCollection", "msrvtt10kval",
        "--testCollection", "msrvtt10ktest",
        "--val_set", "no",
        "--config", "laff",
        "--parm_adjust_configs", "0_12_0_12_0_0_1",
        "--random_seeds", "2",
    ] + sys.argv[1:]))
