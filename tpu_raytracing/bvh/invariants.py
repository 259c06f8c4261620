"""Debug-mode in-build invariant checks (checkify).

The reference SAH builder validates its own state as it runs and aborts
with a diagnostic on violation: task centroid AABBs (`CheckTask`,
src/SharedTaskBuilder.cu:169-195), bin indices in range (:224-235) and a
found/valid SAH plane (:329-347), all behind a shared `error` flag. Under
XLA the equivalents are `checkify.check` assertions compiled into the
build; they are free when disabled (the `check` helper below is a no-op
unless tracing happens inside `run_checked`), and in debug mode a bad
build raises on the host with the failing invariant's message instead of
surfacing later as a wrong image.

Usage:
    from tpu_raytracing.bvh import invariants
    bvh, pairs = invariants.run_checked(build_sah, triangles, True, False)

Tests run the builders through `run_checked` (tests/test_invariants.py);
the app exposes it as `--debug-checks`.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
from jax.experimental import checkify

_state = threading.local()


def _active() -> bool:
    return getattr(_state, "active", False)


@contextmanager
def enabled():
    prev = _active()
    _state.active = True
    try:
        yield
    finally:
        _state.active = prev


def check(pred, msg: str) -> None:
    """Assert ``pred`` (bool scalar) inside a build, only when tracing
    under run_checked — zero cost otherwise."""
    if _active():
        checkify.check(pred, msg)


def run_checked(fn, *args, **kwargs):
    """Run ``fn`` with in-build invariant checks compiled in; raises
    checkify.JaxRuntimeError with the failing invariant's message.

    Positional args are traced (arrays); pass static/config arguments
    (bools, enums, widths) as KEYWORDS — they are bound before tracing
    so Python-level control flow on them keeps working."""
    import functools

    with enabled():
        checked = checkify.checkify(
            jax.jit(functools.partial(fn, **kwargs)),
            errors=checkify.user_checks,
        )
        err, out = checked(*args)
    err.throw()
    return out
