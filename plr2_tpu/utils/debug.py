"""Debugging helpers (SURVEY.md section 5.2): checkify-instrumented
execution for catching NaN/Inf and out-of-bounds inside jitted programs,
and interpreted-mode execution of Pallas kernels."""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
from jax.experimental import checkify


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap a jittable function so it RAISES on NaN/Inf/OOB instead of
    silently propagating:

        loss_fn = checked(my_loss)
        loss = loss_fn(params, batch)   # raises checkify.JaxRuntimeError
    """
    errs = errors or (checkify.float_checks | checkify.index_checks)
    cfn = checkify.checkify(fn, errors=errs)

    def run(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return run


@contextlib.contextmanager
def interpret_pallas():
    """Force Pallas kernels into interpreter mode (CPU-debuggable)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield
