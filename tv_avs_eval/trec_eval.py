#!/usr/bin/env python3
"""CLI wrapper: submission XML -> infAP (argument surface mirrors the
reference ``tv_avs_eval/trec_eval.py``). Uses the Python xinfAP scorer;
pass --use_perl 1 with a sample_eval.pl available for the NIST tool."""

import os
import sys
from optparse import OptionParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laff_tpu.eval.trecvid import evaluate_xml
from laff_tpu.utils import ROOT_PATH


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    parser = OptionParser(usage="usage: %prog [options] input_xml_file")
    parser.add_option("--rootpath", type=str, default=ROOT_PATH)
    parser.add_option("--collection", type=str, default="iacc.3")
    parser.add_option("--overwrite", default=0, type="int")
    parser.add_option("--edition", default="tv18", type="string")
    parser.add_option("--use_perl", default=0, type="int")
    options, args = parser.parse_args(argv)
    if len(args) < 1:
        parser.print_help()
        return 1
    rootpath = os.path.expanduser(options.rootpath)
    qrels = os.path.join(
        rootpath, options.collection, "TextData", f"avs.qrels.{options.edition}"
    )
    inf_ap = evaluate_xml(
        args[0], qrels, overwrite=bool(options.overwrite),
        use_perl=bool(options.use_perl),
    )
    print("%s infAP: \t%.3f" % (options.edition, inf_ap), end="\t")
    return 0


if __name__ == "__main__":
    sys.exit(main())
