"""Artifact-URI IO: state/target paths may be object-store URIs.

Reference parity: the template round-trips its artifacts through GCS —
``entrypoint.sh:170-191`` uploads manifest/run_results/sources.json to
``gs://$BUCKET/prod/`` after a prod run, and ``ci_build.sh:12-24``
downloads that prod state for Slim CI (`state:modified+ --defer`).
The engine's analog: every artifact read/write goes through this
module, so ``--target-path`` / ``--state`` accept

  - plain local paths (unchanged default),
  - ``file://`` URIs,
  - ``memory://`` URIs (an in-process store — hermetic tests and the
    cheapest possible CI hand-off within one process),
  - any scheme fsspec knows (``gs://``, ``s3://``, ...) when fsspec is
    installed — the production path; we delegate rather than vendoring
    cloud clients.

Only small JSON artifacts travel through here (manifest, run_results,
sources.json, catalog docs) — never table data, which stays on Spark's
own Hadoop-FS IO.
"""

from __future__ import annotations

import io
import os

# memory:// store — process-global on purpose: a CI "upload" from one
# Engine instance must be readable as --state by the next.
_MEMORY: dict[str, bytes] = {}


def is_uri(path: str) -> bool:
    return "://" in path


def _scheme(path: str) -> str:
    return path.split("://", 1)[0]


def join(base: str, *parts: str) -> str:
    """os.path.join for paths, '/'-join for URIs (os.path.join would
    collapse the scheme's double slash on some platforms)."""
    if is_uri(base):
        return "/".join([base.rstrip("/"), *parts])
    return os.path.join(base, *parts)


def makedirs(path: str) -> None:
    """mkdir -p for local paths; a no-op for URI schemes (object stores
    have no directories; fsspec filesystems create keys on write)."""
    if not is_uri(path):
        os.makedirs(path, exist_ok=True)
    elif _scheme(path) == "file":
        os.makedirs(path[len("file://"):], exist_ok=True)


def exists(path: str) -> bool:
    if not is_uri(path):
        return os.path.exists(path)
    scheme = _scheme(path)
    if scheme == "memory":
        return path in _MEMORY
    if scheme == "file":
        return os.path.exists(path[len("file://"):])
    return _fsspec().filesystem(scheme).exists(path)


class _MemoryWriter(io.BytesIO):
    def __init__(self, key: str):
        super().__init__()
        self._key = key

    def close(self) -> None:
        _MEMORY[self._key] = self.getvalue()
        super().close()


def open_uri(path: str, mode: str = "r"):
    """Open an artifact path/URI for text read or write.

    Returns a context-manager file object; text mode only (artifacts
    are JSON/HTML).  Unknown schemes delegate to fsspec and raise a
    clear error when it is not installed.
    """
    binary = "b" in mode
    if not is_uri(path):
        return open(path, mode)
    scheme = _scheme(path)
    if scheme == "file":
        return open(path[len("file://"):], mode)
    if scheme == "memory":
        if "w" in mode:
            raw = _MemoryWriter(path)
            return raw if binary else io.TextIOWrapper(raw, encoding="utf-8")
        if path not in _MEMORY:
            raise FileNotFoundError(path)
        raw = io.BytesIO(_MEMORY[path])
        return raw if binary else io.TextIOWrapper(raw, encoding="utf-8")
    return _fsspec().open(path, mode).open()


def _fsspec():
    try:
        import fsspec
    except ImportError as e:  # pragma: no cover - env without fsspec
        raise NotImplementedError(
            "object-store artifact URIs (gs://, s3://, ...) need fsspec "
            "installed; file:// and memory:// work without it"
        ) from e
    return fsspec
