"""Native (C++) host-side components.

``get_fastfeat()`` returns the compiled featurization extension, building
it on first use with the system compiler; returns None when no compiler is
available — callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
from typing import Optional

from ..utils import get_logger

logger = get_logger(__name__)

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "fastfeat.cpp")
_SO = os.path.join(_DIR, "fastfeat" + (sysconfig.get_config_var("EXT_SUFFIX") or ".so"))

_module = None
_build_failed = False


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-shared", "-fPIC",
        "-std=c++17", f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True,
                       timeout=120)
        return True
    except Exception as e:
        detail = getattr(e, "stderr", "") or str(e)
        logger.warning("fastfeat build failed (%s); using Python featurizers",
                       detail.strip()[:200])
        return False


def get_fastfeat() -> Optional[object]:
    global _module, _build_failed
    if _module is not None:
        return _module
    if _build_failed:
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            _build_failed = True
            return None
    try:
        spec = importlib.util.spec_from_file_location("fastfeat", _SO)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        _module = module
        logger.info("fastfeat native featurizer loaded")
        return _module
    except Exception as e:
        logger.warning("fastfeat load failed (%s)", e)
        _build_failed = True
        return None
