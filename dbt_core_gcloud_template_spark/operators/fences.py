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

Arming: ``set_strict(True)`` for a session (a process-global flag —
the "everything in this process must be fenced" user), the
``strict_fences`` context manager for a scope, or ``strict_fences:
true`` in an engine project's ``vars`` / profile target (the runner
arms it for the duration of the run).  Scoped arming rides a
``contextvars`` stack, NOT a process global (r8 advisor): an engine
run with ``strict_fences: true`` must not silently apply
data-dropping production caps to bare operator calls in a
concurrently running non-strict project in the same process.  The
runner propagates its armed context to pool worker threads by
submitting each node through ``contextvars.copy_context().run`` —
plain ``threading.Thread``s spawned by user code start from an empty
context and see only the session flag, which is exactly the scoped
contract.  A ``strict_fences(False)`` scope is now a real localized
force-off (innermost scope wins), something the old counted-global
design could not make race-free.

USER CONTRACT — threads you spawn yourself (r9 advice, explicit): a
strict engine run does NOT automatically extend to threads your model
code creates.  A bare ``threading.Thread`` target builds UNFENCED
plans under a scoped-armed run (it sees only the session flag).  If
your model fans out its own threads, either

- submit the target through ``contextvars.copy_context().run`` (the
  runner's own pattern — inherits the armed scope), or
- re-enter ``with strict_fences():`` inside the thread, or
- arm the session flag ``set_strict(True)`` when EVERY run in the
  process should be strict (the blunt instrument; it leaks into
  concurrent non-strict runs, which is why the runner doesn't use it).

This is a deliberate tradeoff, pinned by
``tests/test_fences.py::test_scoped_arming_is_context_local``: the
alternative — a process-global fallback consulted alongside the scope
stack — is exactly the cross-run cap leak the contextvars redesign
removed.
"""

from __future__ import annotations

import contextvars
import warnings
from contextlib import contextmanager

__all__ = [
    "STRICT_DEFAULTS",
    "UNSET",
    "parse_flag",
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
# Scoped arming stack, context-local (r8 advisor: per-run scoping, not
# a process-global counter).  Each scope pushes its decision; the
# INNERMOST scope wins, falling back to the session flag when no scope
# is open in the current context.  Same-context nesting composes
# (strict inside strict, force-off inside strict); concurrent runs in
# other threads/contexts are untouched by construction.
_scopes: contextvars.ContextVar[tuple[bool, ...]] = contextvars.ContextVar(
    "strict_fence_scopes", default=()
)


def strict_enabled() -> bool:
    stack = _scopes.get()
    if stack:
        return stack[-1]
    return _strict


def set_strict(enabled: bool) -> None:
    """Arm or disarm the session-level strict flag process-wide."""
    global _strict
    _strict = bool(enabled)


def arm_strict() -> None:
    """Scoped arming — the form scoped users (the engine runner, the
    context manager) must use.  Pushes onto the CONTEXT-LOCAL scope
    stack: concurrent runs in other contexts never see it, and paired
    arm/disarm calls compose under same-context nesting (run A's exit
    must not turn the profile off under a still-open scope B in the
    same context, nor re-arm the session after both finish)."""
    _scopes.set(_scopes.get() + (True,))


def disarm_strict() -> None:
    stack = _scopes.get()
    if stack:
        _scopes.set(stack[:-1])


def parse_flag(raw, source: str = "strict_fences"):
    """Strict-boolean parse of a config-sourced flag (r8 advisor):
    YAML round-trips and env plumbing hand the runner strings, and a
    truthiness test would arm the profile on ``"false"``.  ``None``
    means "not configured" (so callers can precedence-resolve between
    sources); anything unrecognizable raises rather than guessing."""
    if raw is None:
        return None
    if isinstance(raw, bool):
        return raw
    if isinstance(raw, int) and raw in (0, 1):
        return bool(raw)
    if isinstance(raw, str):
        s = raw.strip().lower()
        if s in ("true", "1", "yes", "on"):
            return True
        if s in ("false", "0", "no", "off"):
            return False
    raise ValueError(
        f"{source} must be a boolean (true/false), got {raw!r}"
    )


@contextmanager
def strict_fences(enabled: bool = True):
    """Scoped strict mode on the context-local stack — safe under
    concurrent scopes (engine builds on driver threads each run in
    their own context).  ``enabled=False`` is a real force-off scope:
    within it, fences left UNSET stay off even if an outer scope or
    the session flag armed strict mode (innermost scope wins)."""
    token = _scopes.set(_scopes.get() + (bool(enabled),))
    try:
        yield
    finally:
        _scopes.reset(token)


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
