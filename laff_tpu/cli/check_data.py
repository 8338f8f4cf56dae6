#!/usr/bin/env python3
"""Dataset layout checker CLI (reference ``data/check_data.py``).

  python check_data.py msrvtt10ktrain msrvtt10kval --rootpath ~/VisualSearch \
      --features clip_finetune_8frame_uniform_1103,X3D_L
"""

import argparse
import sys

from laff_tpu.data.check import check_environment
from laff_tpu.utils import ROOT_PATH


def main(argv=None):
    parser = argparse.ArgumentParser("collection layout checker")
    parser.add_argument("collections", nargs="+")
    parser.add_argument("--rootpath", default=ROOT_PATH)
    parser.add_argument("--features", default="",
                        help="comma-separated feature dir names to verify")
    args = parser.parse_args(argv)
    feats = [f for f in args.features.split(",") if f]
    ok = check_environment(args.rootpath, args.collections, feats)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
