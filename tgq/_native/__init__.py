"""Native (C++) serving-runtime components, built on demand.

``get_page_alloc_cls()`` returns the compiled ``PageAlloc`` type or
``None`` if the toolchain is unavailable — callers fall back to the
pure-Python implementation (tgq.serve.kv_cache.PageTable) with identical
semantics (equivalence is tested).
"""
from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "tgq_pagealloc.so")
_SRC = os.path.join(_HERE, "pagealloc.cc")

_cached = False
_cls = None


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"), "-O2", "-shared", "-fPIC",
        "-std=c++17", f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing compiler, etc.
        logger.debug("native build failed: %s", e)
        return False


def get_page_alloc_cls():
    global _cached, _cls
    if _cached:
        return _cls
    _cached = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    if _HERE not in sys.path:
        sys.path.insert(0, _HERE)
    try:
        import tgq_pagealloc

        _cls = tgq_pagealloc.PageAlloc
    except Exception as e:
        logger.debug("native import failed: %s", e)
        _cls = None
    return _cls
