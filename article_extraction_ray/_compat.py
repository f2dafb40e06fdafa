"""Runtime compatibility shims for known thread-safety gaps in deps.

One shim today: ``ray.data``'s path resolution executes
``from fsspec.implementations.http import HTTPFileSystem`` on every
read (ray/data/datasource/path_util.py), catching only
``ModuleNotFoundError``.  In environments without ``aiohttp`` that
import fails afresh on each call (failed modules are evicted from
``sys.modules``), and when two DRIVER THREADS resolve paths at the
same instant — the flagship overlaps its giant-doc phase in a second
thread, and user code may race reads too — one thread can observe the
sibling's partially-initialized module and get a bare
``ImportError("cannot import name 'HTTPFileSystem' ...")`` that
escapes ray's ``except ModuleNotFoundError`` and kills the job.

``install_fsspec_http_stub()`` resolves the race once and for all: if
the real import fails because ``aiohttp`` is missing, it publishes a
minimal stub module under ``fsspec.implementations.http`` whose
``HTTPFileSystem`` raises on *instantiation*.  All subsequent
from-imports then succeed instantly and thread-safely; ray's
``isinstance(..., HTTPFileSystem)`` guards still return False for
local filesystems; an actual attempt to read an http:// URL still
fails loudly with the true cause.
"""

from __future__ import annotations

import sys
import types


def install_fsspec_http_stub() -> bool:
    """Idempotently stub ``fsspec.implementations.http`` when aiohttp
    is absent.  Returns True if the stub was installed (or already
    present), False if the real module imports fine and no shim is
    needed."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return False  # real module works; nothing to do
    except ImportError:
        pass

    name = "fsspec.implementations.http"
    existing = sys.modules.get(name)
    if existing is not None and hasattr(existing, "HTTPFileSystem"):
        return True  # our stub (or a working module) already published

    try:
        import fsspec.spec as _spec

        base = _spec.AbstractFileSystem
    except Exception:  # pragma: no cover - fsspec itself missing
        base = object

    class HTTPFileSystem(base):  # type: ignore[misc,valid-type]
        """Stub standing in for the aiohttp-backed filesystem."""

        def __init__(self, *args, **kwargs):
            raise ImportError(
                "fsspec HTTPFileSystem requires aiohttp, which is not "
                "installed in this environment; http(s):// paths are "
                "not readable here."
            )

    mod = types.ModuleType(name)
    mod.HTTPFileSystem = HTTPFileSystem
    mod.__doc__ = __doc__
    sys.modules[name] = mod
    # also bind as attribute so `fsspec.implementations.http` attribute
    # access resolves to the same stub
    try:
        import fsspec.implementations as _impls

        _impls.http = mod
    except Exception:  # pragma: no cover
        pass
    return True
