"""Adding method for diffuse transport (Shonk & Hogan 2008).

Reference parity: ``adding`` in ``rte/kernels/mo_rte_solver_kernels.F90
:1526-1637`` (shared by LW 2-stream and SW 2-stream).

Canonical orientation: top at layer index 0, surface below layer nlay-1.

Two execution modes:
  - "sequential": two lax.scans exactly mirroring the reference's sweeps
    (albedo/source sweep surface->top, flux sweep top->surface).
  - "parallel": log-depth formulation. The surface-upward sweep is a suffix
    composition of per-layer slab operators -- combining two slabs'
    (R, T, S_up, S_dn) is the classic associative adding/doubling rule --
    evaluated with lax.associative_scan; the downward flux sweep is an
    affine recurrence. This is the O(log nlay) depth version the Fortran
    loops cannot express.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .scan import affine_scan


def adding(albedo_sfc, rdif, tdif, src_dn, src_up, src_sfc, flux_dn_top, mode="sequential",
           broadband=False):
    """Compute diffuse flux_up/flux_dn at all levels.

    albedo_sfc, src_sfc, flux_dn_top: (ncol, ngpt)
    rdif, tdif, src_dn, src_up: (ncol, nlay, ngpt)
    Returns (flux_up, flux_dn), each (ncol, nlay+1, ngpt); with
    ``broadband=True`` the spectral reduction happens inside the downward
    sweep and the results are (ncol, nlay+1) sums.
    """
    nlay = rdif.shape[1]

    # harmonize mixed input dtypes (scan carries must be type-stable)
    dtype = jnp.result_type(
        rdif.dtype, tdif.dtype, src_dn.dtype, src_up.dtype,
        albedo_sfc.dtype, src_sfc.dtype, flux_dn_top.dtype,
    )
    rdif, tdif = rdif.astype(dtype), tdif.astype(dtype)
    src_dn, src_up = src_dn.astype(dtype), src_up.astype(dtype)
    albedo_sfc, src_sfc = albedo_sfc.astype(dtype), src_sfc.astype(dtype)
    flux_dn_top = flux_dn_top.astype(dtype)

    if broadband and mode == "sequential":
        # below-level sweep: emits (albedo, src) at level l+1 per layer l
        # directly (the quantities the downward sweep consumes), skipping
        # the shifted-slice copies of two (ncol, nlay+1, ngpt) stacks.
        alb_below, src_below, alb_top, src_top = _albedo_src_below_sequential(
            albedo_sfc, rdif, tdif, src_dn, src_up, src_sfc
        )
        denom = 1.0 / (1.0 - rdif * alb_below)
        a = tdif * denom
        b = (rdif * src_below + src_dn) * denom
        return _broadband_down_sweep(
            flux_dn_top, a, b, alb_below, src_below, alb_top, src_top)

    if mode == "parallel":
        albedo, src = _albedo_src_parallel(albedo_sfc, rdif, tdif, src_dn, src_up, src_sfc)
    else:
        albedo, src = _albedo_src_sequential(albedo_sfc, rdif, tdif, src_dn, src_up, src_sfc)

    # denom (beta in SH08, Eq 10) uses the albedo *below* each layer.
    denom = 1.0 / (1.0 - rdif * albedo[:, 1:, :])

    # Downward flux sweep (SH08 Eq 13): affine recurrence
    #   flux_dn[l+1] = (tdif[l] flux_dn[l] + rdif[l] src[l+1] + src_dn[l]) * denom[l]
    a = tdif * denom
    b = (rdif * src[:, 1:, :] + src_dn) * denom

    if broadband:
        return _broadband_down_sweep(
            flux_dn_top, a, b, albedo[:, 1:, :], src[:, 1:, :],
            albedo[:, 0, :], src[:, 0, :])

    flux_dn = affine_scan(a, b, flux_dn_top, axis=1, mode=mode)

    # SH08 Eq 12 at every level.
    flux_up = flux_dn * albedo + src
    return flux_up, flux_dn


def _broadband_down_sweep(flux_dn_top, a, b, alb_below, src_below, alb0, src0):
    """Top-to-surface affine flux sweep with in-scan spectral reduction:
    fdn[l+1] = a[l] fdn[l] + b[l], fup from the below-level (albedo, src),
    level-0 seam from (alb0, src0). Shared by both broadband adding paths
    so the reduction semantics cannot diverge. Returns (bb_up, bb_dn),
    each (ncol, nlay+1)."""

    def step(fdn, xs):
        t, s, albl, srcl = xs
        fdn_next = t * fdn + s
        fup_next = fdn_next * albl + srcl
        return fdn_next, (jnp.sum(fdn_next, -1), jnp.sum(fup_next, -1))

    _, (dn_sums, up_sums) = jax.lax.scan(
        step, flux_dn_top,
        (jnp.moveaxis(a, 1, 0), jnp.moveaxis(b, 1, 0),
         jnp.moveaxis(alb_below, 1, 0), jnp.moveaxis(src_below, 1, 0)),
    )
    bb_dn0 = jnp.sum(flux_dn_top, -1)
    bb_up0 = jnp.sum(flux_dn_top * alb0 + src0, -1)
    bb_dn = jnp.concatenate([bb_dn0[:, None], jnp.moveaxis(dn_sums, 0, 1)], axis=1)
    bb_up = jnp.concatenate([bb_up0[:, None], jnp.moveaxis(up_sums, 0, 1)], axis=1)
    return bb_up, bb_dn


def _albedo_src_below_sequential(albedo_sfc, rdif, tdif, src_dn, src_up, src_sfc):
    """Surface-to-top sweep emitting the PRE-update carry: for layer l the
    stacked outputs are (albedo, src) at level l+1 -- what the downward
    flux sweep consumes -- plus the final (level-0) values. Avoids
    re-slicing the full level stacks (two HBM round-trips)."""

    def step(carry, x):
        alb_below, src_below = carry
        r, t, sd, su = x
        denom = 1.0 / (1.0 - r * alb_below)  # Eq 10
        alb = r + t * t * alb_below * denom  # Eq 9
        src = su + t * denom * (src_below + alb_below * sd)  # Eq 11
        return (alb, src), (alb_below, src_below)

    xs = (
        jnp.moveaxis(rdif, 1, 0),
        jnp.moveaxis(tdif, 1, 0),
        jnp.moveaxis(src_dn, 1, 0),
        jnp.moveaxis(src_up, 1, 0),
    )
    (alb_top, src_top), (albs_b, srcs_b) = jax.lax.scan(
        step, (albedo_sfc, src_sfc), xs, reverse=True
    )
    return (
        jnp.moveaxis(albs_b, 0, 1), jnp.moveaxis(srcs_b, 0, 1),
        alb_top, src_top,
    )


def _albedo_src_sequential(albedo_sfc, rdif, tdif, src_dn, src_up, src_sfc):
    """Surface-to-top sweep for cumulative albedo and upwelling source
    (SH08 Eqs 9-11), as a reverse lax.scan over layers."""

    def step(carry, x):
        alb_below, src_below = carry
        r, t, sd, su = x
        denom = 1.0 / (1.0 - r * alb_below)  # Eq 10
        alb = r + t * t * alb_below * denom  # Eq 9
        src = su + t * denom * (src_below + alb_below * sd)  # Eq 11
        return (alb, src), (alb, src)

    xs = (
        jnp.moveaxis(rdif, 1, 0),
        jnp.moveaxis(tdif, 1, 0),
        jnp.moveaxis(src_dn, 1, 0),
        jnp.moveaxis(src_up, 1, 0),
    )
    # reverse=True walks surface-to-top and stacks outputs in layer order --
    # no materialized reversed copies of the four (nlay, ncol, ngpt) inputs
    (_, _), (albs, srcs) = jax.lax.scan(step, (albedo_sfc, src_sfc), xs, reverse=True)
    albedo = jnp.concatenate([albs, albedo_sfc[None]], axis=0)
    src = jnp.concatenate([srcs, src_sfc[None]], axis=0)
    return jnp.moveaxis(albedo, 0, 1), jnp.moveaxis(src, 0, 1)


def _albedo_src_parallel(albedo_sfc, rdif, tdif, src_dn, src_up, src_sfc):
    """Log-depth suffix combination of slab operators.

    Each slab is (Rt, Rb, T, Su, Sd): reflectance to illumination from above
    (Rt) and from below (Rb), transmittance T (direction-independent by
    reciprocity), and the upwelling/downwelling source exiting top/bottom.
    A single two-stream layer is symmetric (Rt = Rb = rdif), but a combined
    stack is not, so both reflectances must be carried for the combination
    rule to stay associative. Combining slab A above stack B:
        d   = 1 / (1 - Rb_A Rt_B)
        Rt  = Rt_A + T_A^2 Rt_B d
        Rb  = Rb_B + T_B^2 Rb_A d
        T   = T_A T_B d
        Su  = Su_A + T_A d (Su_B + Rt_B Sd_A)
        Sd  = Sd_B + T_B d (Sd_A + Rb_A Su_B)
    The suffix stack from layer l to the surface yields (Rt, Su) ==
    (albedo, src) at level l; the surface is a pseudo-slab with
    Rt = albedo_sfc, T = 0, Su = src_sfc.
    """
    zeros_sfc = jnp.zeros_like(albedo_sfc)
    Rt = jnp.concatenate([rdif, albedo_sfc[:, None, :]], axis=1)
    Rb = jnp.concatenate([rdif, zeros_sfc[:, None, :]], axis=1)
    T = jnp.concatenate([tdif, zeros_sfc[:, None, :]], axis=1)
    Su = jnp.concatenate([src_up, src_sfc[:, None, :]], axis=1)
    Sd = jnp.concatenate([src_dn, zeros_sfc[:, None, :]], axis=1)

    def combine(below, above):
        # With reverse=True, associative_scan hands the accumulated *suffix*
        # (the stack below) as the first argument and the new element (the
        # slab above it) as the second.
        rtb, rbb, tb, sub, sdb = below
        rta, rba, ta, sua, sda = above
        d = 1.0 / (1.0 - rba * rtb)
        rt = rta + ta * ta * rtb * d
        rb = rbb + tb * tb * rba * d
        t = ta * tb * d
        su = sua + ta * d * (sub + rtb * sda)
        sd = sdb + tb * d * (sda + rba * sub)
        return rt, rb, t, su, sd

    rt, _, _, su, _ = jax.lax.associative_scan(
        combine, (Rt, Rb, T, Su, Sd), axis=1, reverse=True
    )
    return rt, su
