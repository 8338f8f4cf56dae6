#!/usr/bin/env python3
"""LAFF-ml (FrameLAFF) on MSR-VTT (MV-test3k) — the headline LAFF-ml
reproduction (reference shell/do_laffml_mvtest3k.sh)."""
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
        "--config", "FrameLaff_NoFrameFc_StrongCLIP_adjust",
        "--parm_adjust_configs", "0_7_1_12_0_12_0",
        "--random_seeds", "2",
    ] + sys.argv[1:]))
