"""Exact-matmul table tricks shared by the XLA and Pallas paths.

The TPU MXU truncates f32 matmul operands to bf16. Splitting one operand
into three bf16-representable terms (hi + mid + lo == x exactly in f32)
makes a one-hot row-pick matmul reproduce an f32 gather to <= 1 ulp --
measured BIT-exact for the Planck table on real RFMIP temperatures
(1-term split leaves 3.8e-3 relative, 2-term 7.5e-6, 3-term exact).

Single source of truth for extensions/cloud_optics.py (XLA LUT interp),
ops/pallas/lw_megakernel.py (in-kernel Planck + cloud tables), and
ops/pallas/sw_megakernel.py -- the staged-vs-kernel bit-exactness claims
depend on both sides building IDENTICAL table layouts.
"""
from __future__ import annotations

import jax.numpy as jnp


def split3_bf16(x):
    """x == hi + mid + lo exactly, each term bf16-representable."""
    hi = x.astype(jnp.bfloat16).astype(x.dtype)
    r = x - hi
    mid = r.astype(jnp.bfloat16).astype(x.dtype)
    return hi, mid, r - mid


def paired_diff_table(*tables, dtype=jnp.float32):
    """Combined [values | forward diffs] lerp table: tables are each
    (nband, nsteps); returns (nsteps, 2 * n_tables * nband) with the last
    row's diff zero-padded (never picked: index <= nsteps - 2).
    Interpolate as ``vals = pick[:, :k] + frac * pick[:, k:]`` where
    k = n_tables * nband."""
    cat = jnp.concatenate(
        [jnp.asarray(t).T.astype(dtype) for t in tables], axis=1)
    dcat = jnp.concatenate(
        [cat[1:] - cat[:-1], jnp.zeros((1, cat.shape[1]), dtype)], axis=0)
    return jnp.concatenate([cat, dcat], axis=1)
