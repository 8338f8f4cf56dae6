from .infap import sample_eval, parse_infap
from .txt2xml import scores_to_xml
from .trec_eval import evaluate_xml, xml_to_treceval

__all__ = [
    "sample_eval",
    "parse_infap",
    "scores_to_xml",
    "evaluate_xml",
    "xml_to_treceval",
]
