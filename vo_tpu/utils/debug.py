"""Dev-mode debugging: NaN trapping, determinism checks, compile logging.

SURVEY §5 "race detection / sanitizers": the engine is single-program XLA,
so the sanitizer analogue is (a) NaN debugging — ``jax_debug_nans`` re-runs
the offending primitive un-jitted and raises at the exact op — and (b)
determinism checks: the jitted step is a pure function of its inputs, so
identical inputs must produce bit-identical outputs (tests/test_dist.py::
test_step_determinism).
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def nan_debug():
    """Trap NaNs at the producing primitive (slow; dev only)."""
    import jax

    prev = bool(jax.config.jax_debug_nans)
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def compile_logging():
    """Log every XLA compilation (catches accidental retracing in the frame loop)."""
    import jax

    prev = bool(jax.config.jax_log_compiles)
    jax.config.update("jax_log_compiles", True)
    try:
        yield
    finally:
        jax.config.update("jax_log_compiles", prev)


def check_determinism(fn, *args, n: int = 2) -> bool:
    """Run ``fn`` n times on identical inputs; True iff outputs are bit-identical."""
    import jax
    import numpy as np

    outs = [jax.tree.map(np.asarray, fn(*args)) for _ in range(n)]
    ref = outs[0]
    for other in outs[1:]:
        ok = jax.tree.map(lambda a, b: bool(np.array_equal(a, b)), ref, other)
        if not all(jax.tree.leaves(ok)):
            return False
    return True
