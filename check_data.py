#!/usr/bin/env python3
"""Repo-root shim matching the reference script name; the implementation
lives in laff_tpu.cli.check_data (installed as the console script). Importing this
module yields the implementation module itself, so every attribute —
including test-visible internals — resolves identically."""
import sys as _sys

from laff_tpu.cli import check_data as _impl

if __name__ == "__main__":
    _sys.exit(_impl.main())
else:
    _sys.modules[__name__] = _impl
