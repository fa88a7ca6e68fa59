"""Strict-fence profile — production skew-fence defaults on demand.

Every skew fence in the dedup/similarity ladder (``max_bucket_size``
on the LSH and sign-bucket joins, ``max_occurrences`` on the
span/passage window indexes, ``max_cluster_size`` on the SemDeDup
cluster join) defaults to OFF: the library's unfenced semantics are
the exact published algorithms, the right default for correctness
work and for the oracle gate.  But an ad-hoc 100 TB user calling
``semdedup()`` bare gets the unfenced quadratic — one degenerate
cluster away from a job that never finishes.

This module is the profile-level switch (r7 verdict #6).  With strict
mode on, every fence-capable operator that was called WITHOUT a fence
argument adopts the production default from :data:`STRICT_DEFAULTS`;
an operator called with an explicit ``None`` (the caller consciously
disabling the fence) stays unfenced but emits a ``UserWarning`` so
the disablement is visible in logs.  Explicit numeric caps always win
untouched.

The distinction between "not passed" and "explicitly disabled" rides
on the :data:`UNSET` sentinel, which is every fence parameter's
declared default — mirroring how the engine's §4 guards distinguish a
missing profile key from a configured-off one.

Arming: ``set_strict(True)`` for a session, the ``strict_fences``
context manager for a scope, or ``strict_fences: true`` in an engine
project's ``vars`` / profile target (the runner arms it for the
duration of the run).  The flag is process-global on purpose — the
engine executes DAG nodes on a thread pool and a safety profile that
silently didn't apply to worker threads would be worse than none.
"""

from __future__ import annotations

import threading
import warnings
from contextlib import contextmanager

__all__ = [
    "STRICT_DEFAULTS",
    "UNSET",
    "resolve",
    "set_strict",
    "strict_enabled",
    "strict_fences",
]


class _Unset:
    """Sentinel for 'fence argument not passed' (vs explicit None)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # shows up in signatures / reprs
        return "UNSET"

    def __bool__(self) -> bool:
        return False


UNSET = _Unset()

# Production defaults, sized for the 100 TB regime the fences exist
# for: an LSH/sign bucket beyond 10k members is boilerplate whose m²
# pair expansion would dominate the stage; a window/passage repeated
# beyond 100k times corpus-wide is chrome, not content; a SemDeDup
# cluster beyond 100k vectors is the degenerate quadratic the paper's
# cluster split exists to avoid.
STRICT_DEFAULTS: dict[str, int] = {
    "max_bucket_size": 10_000,
    "max_occurrences": 100_000,
    "max_cluster_size": 100_000,
}

_strict = False
_arm_count = 0
_lock = threading.Lock()


def strict_enabled() -> bool:
    return _strict or _arm_count > 0


def set_strict(enabled: bool) -> None:
    """Arm or disarm the session-level strict flag process-wide."""
    global _strict
    with _lock:
        _strict = bool(enabled)


def arm_strict() -> None:
    """COUNTED arming — the form scoped users (the engine runner, the
    context manager) must use: concurrent scopes compose instead of
    clobbering each other's save/restore (run A's exit must not turn
    the profile off under run B, nor B's exit re-arm the session after
    both finish).  Strict is on while ANY scope is armed or the
    session flag is set."""
    global _arm_count
    with _lock:
        _arm_count += 1


def disarm_strict() -> None:
    global _arm_count
    with _lock:
        _arm_count = max(0, _arm_count - 1)


@contextmanager
def strict_fences(enabled: bool = True):
    """Scoped strict mode via counted arming — safe under concurrent
    scopes (engine builds on driver threads).  ``enabled=False`` is a
    no-op scope: a global force-off cannot be made race-free while
    another run is legitimately armed, so disable strictness by not
    arming it (or per call site, with an explicit ``None`` fence)."""
    if not enabled:
        yield
        return
    arm_strict()
    try:
        yield
    finally:
        disarm_strict()


def resolve(fence: str, value, operator: str):
    """Resolve a fence parameter at an operator entry point.

    - explicit int → used as-is (caller knows their corpus);
    - :data:`UNSET` (not passed) → strict default when strict mode is
      on, else ``None`` (fence off — the library default);
    - explicit ``None`` → fence off, plus a ``UserWarning`` under
      strict mode (a consciously disabled fence must be visible).
    """
    if value is UNSET:
        return STRICT_DEFAULTS[fence] if strict_enabled() else None
    if value is None and strict_enabled():
        warnings.warn(
            f"{operator}: {fence} explicitly disabled under the strict "
            "fence profile — one degenerate group can dominate the "
            "stage at scale",
            UserWarning,
            stacklevel=3,
        )
    return value
