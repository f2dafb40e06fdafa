"""The fsspec-http import-race shim (article_extraction_ray/_compat.py)."""

import importlib
import sys
import threading


def test_stub_makes_from_import_thread_safe():
    try:
        import aiohttp  # noqa: F401

        import pytest

        pytest.skip("aiohttp present; real fsspec http module works")
    except ImportError:
        pass

    import article_extraction_ray  # noqa: F401 - installs the stub

    # the exact from-import ray.data performs on every path resolution
    # must now succeed deterministically from many threads at once
    errors = []

    def probe():
        try:
            from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=probe) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # instantiation (a real http:// read) still fails loudly
    from fsspec.implementations.http import HTTPFileSystem

    try:
        HTTPFileSystem()
        raise AssertionError("stub HTTPFileSystem must refuse to build")
    except ImportError as exc:
        assert "aiohttp" in str(exc)


def test_stub_is_idempotent():
    from article_extraction_ray._compat import install_fsspec_http_stub

    first = install_fsspec_http_stub()
    second = install_fsspec_http_stub()
    assert first == second
