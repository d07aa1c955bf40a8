"""Shared fixtures for the multi-process distributed tests.

tests/dist_step_runner.py (the spawned worker) and tests/test_distributed.py
(the single-process cross-checks) must build BYTE-IDENTICAL global batches —
the loss comparisons are only valid if both sides draw the same values, so
the constructor lives here and both import it. dist_step_runner.py itself
cannot be imported by the test (it calls init_distributed at module level),
which is why this is a separate module.

Note model_points reuses target's key (ks[3]): target == model_points,
i.e. the GT pose is the identity — part of the byte-identical contract
both sides rely on.
"""

import jax
import jax.numpy as jnp

CROP, NPTS, NOBJ = 48, 64, 2


def make_full_batch(batch):
    ks = jax.random.split(jax.random.key(1), 5)
    return {
        "img": jax.random.normal(ks[0], (batch, CROP, CROP, 3), jnp.float32),
        "points": jax.random.normal(ks[1], (batch, NPTS, 3)) * 0.1,
        "choose": jax.random.randint(ks[2], (batch, NPTS), 0, CROP * CROP),
        "target": jax.random.normal(ks[3], (batch, 64, 3)) * 0.05,
        "model_points": jax.random.normal(ks[3], (batch, 64, 3)) * 0.05,
        "idx": jnp.arange(batch, dtype=jnp.int32) % NOBJ,
    }
