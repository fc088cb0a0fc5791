"""Fast exponential for nonpositive arguments (FAST_EXPONENTIAL parity).

Reference: ``exp_fast`` in ``rte/kernels/mo_rte_solver_kernels.F90:90-106``
-- a Pade approximant that stays positive for negative arguments, applied
to ``x/8`` and squared three times. When the reference is built with
``-DFAST_EXPONENTIAL`` every *solver* exponential routes through it: the
LW no-scat transmittance (:237), the LW two-stream ``exp(-k*tau)``
(:1050), the SW direct beam (:520-526), and the SW two-stream ``Tnoscat``
/ ``exp(-k*tau)`` (:1293,1311,1405,1422). The Tang-rescaled LW branch
deliberately uses the exact ``exp`` (:231) and so do we.

``exp_maybe_fast`` reads ``config.fast_exponential`` at TRACE time. The
package front-ends construct fresh jit wrappers per call, so flipping the
flag there retraces; but a jitted function a USER holds onto (a cached
driver core, a bench closure) will NOT retrace on a flag flip and keeps
the numerics it was traced with -- flip the flag before building the
jitted function, or rebuild it after.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import config


def exp_fast(x):
    """The Pade form itself, unconditionally."""
    ex = 1.0 / (1.0 + x * (-0.125 + x * (0.0078125 - 0.000325520833333333 * x)))
    ex = ex * ex
    ex = ex * ex
    return ex * ex


def exp_maybe_fast(x):
    """exp(x), or the reference's Pade ``exp_fast`` under
    ``config.fast_exponential``."""
    if config.fast_exponential:
        return exp_fast(x)
    return jnp.exp(x)
