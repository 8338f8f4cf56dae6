#!/usr/bin/env python3
"""CLI wrapper: ranked score file -> NIST submission XML (argument surface
mirrors the reference ``tv_avs_eval/txt2xml.py``)."""

import os
import sys
from optparse import OptionParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laff_tpu.eval.trecvid import scores_to_xml
from laff_tpu.utils import ROOT_PATH


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    parser = OptionParser(usage="usage: %prog [options] collection input_txt_file")
    parser.add_option("--rootpath", type=str, default=ROOT_PATH)
    parser.add_option("--overwrite", default=0, type="int")
    parser.add_option("--trtype", default="D", type="string")
    parser.add_option("--edition", default="tv18", type="string")
    parser.add_option("--pclass", default="F", type="string")
    parser.add_option("--pid", default="RUCMM", type="string")
    parser.add_option("--desc", default="place holder", type="string")
    parser.add_option("--etime", default=25.0, type="float")
    parser.add_option("--topk", default=1000, type="int")
    parser.add_option("--priority", default=1, type="int")
    options, args = parser.parse_args(argv)
    if len(args) < 2:
        parser.print_help()
        return 1
    rootpath = os.path.expanduser(options.rootpath)
    collection, input_txt_file = args[0], args[1]
    topics_file = os.path.join(
        rootpath, collection, "TextData", f"{options.edition}.avs.txt"
    )
    shots_file = os.path.join(
        rootpath, collection, "VideoSets", f"{collection}.txt"
    )
    scores_to_xml(
        input_txt_file,
        topics_file=topics_file if os.path.exists(topics_file) else None,
        shots_file=shots_file if os.path.exists(shots_file) else None,
        topk=options.topk, trtype=options.trtype, pclass=options.pclass,
        pid=options.pid, priority=options.priority, desc=options.desc,
        etime=options.etime, overwrite=bool(options.overwrite),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
