#!/usr/bin/env python3
"""Dataset layout setup (replaces ``data/do_{msrvtt,mvtest1k,msvd,tgif,
vatex}.sh``): unpack a released feature archive and symlink the
train/val/test split directories onto the shared base collection.

The reference ships five near-identical shell scripts (do_msrvtt.sh:1-18
is the template; do_vatex.sh has an unset-``$split`` bug that this
rewrite fixes by intent). Each split directory gets:

  <split>/FeatureData        -> <base>/FeatureData
  <split>/FeatureData/frame  -> <base>/FrameFeatureData
  <split>/TextData           -> <base>/TextData
  <split>/VideoSets          -> <base>/VideoSets

Usage:
  python data/setup_dataset.py msrvtt --zip msrvtt.zip
  python data/setup_dataset.py vatex --rootpath ~/VisualSearch
"""

import argparse
import os
import sys
import zipfile

DATASETS = {
    # dataset -> (base collection, split dir names)
    "msrvtt": ("msrvtt10k", ["msrvtt10ktrain", "msrvtt10kval", "msrvtt10ktest"]),
    "mvtest1k": ("msrvtt1kA", ["msrvtt1kAtrain", "msrvtt1kAval", "msrvtt1kAtest"]),
    "msvd": ("msvd", ["msvdtrain", "msvdval", "msvdtest"]),
    "tgif": ("tgif", ["tgiftrain", "tgifval", "tgiftest"]),
    "vatex": ("vatex", ["vatex_train", "vatex_val1k5", "vatex_test1k5"]),
}


def setup(dataset, rootpath, zip_path=None):
    base, splits = DATASETS[dataset]
    rootpath = os.path.expanduser(rootpath)
    os.makedirs(rootpath, exist_ok=True)

    if zip_path:
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(rootpath)
        print(f"unpacked {zip_path} into {rootpath}")

    base_dir = os.path.join(rootpath, base)
    if not os.path.isdir(base_dir):
        raise SystemExit(f"base collection missing: {base_dir} "
                         f"(pass --zip or unpack the release there first)")

    def link(target, name):
        if os.path.lexists(name):
            return
        os.symlink(target, name)

    for split in splits:
        sdir = os.path.join(rootpath, split)
        os.makedirs(sdir, exist_ok=True)
        link(os.path.join(base_dir, "FeatureData"),
             os.path.join(sdir, "FeatureData"))
        frame_src = os.path.join(base_dir, "FrameFeatureData")
        if os.path.isdir(frame_src):
            link(frame_src, os.path.join(base_dir, "FeatureData", "frame"))
        link(os.path.join(base_dir, "TextData"),
             os.path.join(sdir, "TextData"))
        link(os.path.join(base_dir, "VideoSets"),
             os.path.join(sdir, "VideoSets"))
        print(f"linked {split} -> {base}")


def main(argv=None):
    parser = argparse.ArgumentParser("dataset layout setup")
    parser.add_argument("dataset", choices=sorted(DATASETS))
    parser.add_argument("--rootpath",
                        default=os.path.join(os.path.expanduser("~"),
                                             "VisualSearch"))
    parser.add_argument("--zip", default=None,
                        help="feature release archive to unpack first")
    args = parser.parse_args(argv)
    setup(args.dataset, args.rootpath, args.zip)
    return 0


if __name__ == "__main__":
    sys.exit(main())
