"""Environment compatibility shims.

``fsspec.implementations.http`` needs aiohttp, which is absent here.
Ray Data's path resolution probes it on EVERY read/write
(ray/data/datasource/path_util.py::_is_http_filesystem) catching only
ModuleNotFoundError; when two Dataset executions start on different
threads (our concurrent doc_table/segments stages), the racing failed
imports can surface as a plain ImportError ("cannot import name
'HTTPFileSystem'") that Ray does not catch. Registering a stub module
with a sentinel class makes the probe deterministic, cheap and
race-free; the sentinel never matches ``isinstance``, so behavior is
identical to "module not installed".
"""

from __future__ import annotations

import sys
import types


def patch_fsspec_http() -> None:
    try:
        import fsspec.implementations.http  # noqa: F401
        return  # real module works; nothing to do
    except ImportError:
        pass
    try:
        import fsspec.implementations
    except ImportError:
        return  # no fsspec at all; Ray handles that path itself
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel: never instantiated
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    fsspec.implementations.http = mod


patch_fsspec_http()
