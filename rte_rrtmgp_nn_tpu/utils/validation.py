"""Array validation utilities.

Reference parity: ``rte/mo_rte_util_array.F90:21-39`` --
``any_vals_less_than`` / ``any_vals_outside`` (plain and masked),
``extents_are``, ``zero_array``. Host-side checks (used when
config.check_values is on, outside jit) plus jit-safe variants returning
boolean scalars.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def any_vals_less_than(array, check_value, mask=None) -> bool:
    a = np.asarray(array)
    if mask is not None:
        m = np.asarray(mask).astype(bool)
        if not m.any():
            return False
        return bool(np.nanmin(np.where(m, a, np.inf)) < check_value)
    return bool(np.nanmin(a) < check_value)


def any_vals_outside(array, check_min, check_max, mask=None) -> bool:
    a = np.asarray(array)
    if mask is not None:
        m = np.asarray(mask).astype(bool)
        if not m.any():
            return False
        lo = np.nanmin(np.where(m, a, np.inf))
        hi = np.nanmax(np.where(m, a, -np.inf))
    else:
        lo, hi = np.nanmin(a), np.nanmax(a)
    return bool(lo < check_min or hi > check_max)


def extents_are(array, *extents: int) -> bool:
    return tuple(np.shape(array)) == tuple(extents)


def zero_array(shape: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros(tuple(shape), dtype)


# jit-safe variants (return traced booleans; use with jax.debug or as
# outputs for host inspection)

def any_vals_less_than_jit(array, check_value):
    return jnp.min(array) < check_value


def any_vals_outside_jit(array, check_min, check_max):
    return jnp.logical_or(jnp.min(array) < check_min, jnp.max(array) > check_max)
