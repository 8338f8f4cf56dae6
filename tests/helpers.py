"""Synthetic-collection builder shared by data/engine/e2e tests.

The implementation lives in the package (laff_tpu.data.synth) because the
multichip dryrun and the rehearsal benchmark builder need it too; this
module keeps the historical test-local import path working.
"""

from laff_tpu.data.synth import WORDS, build_collection, build_w2v

__all__ = ["WORDS", "build_collection", "build_w2v"]
