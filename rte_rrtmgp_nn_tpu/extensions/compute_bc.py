"""Upper boundary condition from an isothermal cap layer.

Reference parity: ``extensions/mo_compute_bc.F90:51-246`` -- build one
layer spanning the k-distribution's minimum pressure down to the domain
top, run single-layer gas optics and transport on it, and return the
spectral downward flux at the domain top for use as the solver's incident
flux.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..gas_concs import GasConcs
from ..gasoptics.kdist import KDist
from ..gasoptics.lut_gas_optics import gas_optics_lw_lut, gas_optics_sw_lut
from ..rte import rte_lw, rte_sw


def compute_bc(
    kd: KDist,
    tlay_top: jnp.ndarray,
    plev_top: jnp.ndarray,
    gas_desc: GasConcs,
    mu0: Optional[jnp.ndarray] = None,
    top_at_1: bool = True,
) -> jnp.ndarray:
    """Spectral downward flux (ncol, ngpt) at pressure ``plev_top``.

    tlay_top: (ncol,) temperature of the cap layer; plev_top: (ncol,)
    domain-top pressure [Pa]; mu0 present selects the SW path. top_at_1
    states the orientation of ``gas_desc``'s layer axis so the cap layer
    reuses the TOP-of-domain concentrations either way (the reference
    samples layer 1 vs nlay, mo_compute_bc.F90).
    """
    ncol = tlay_top.shape[0]
    dtype = tlay_top.dtype
    p_min = kd.press_ref_min
    play = jnp.maximum((p_min + plev_top[:, None]) * 0.5, p_min * 1.0001)
    plev = jnp.stack([jnp.full((ncol,), p_min * 1.00005, dtype), plev_top], axis=1)
    tlay = tlay_top[:, None]
    tlev = jnp.stack([tlay_top, tlay_top], axis=1)

    # cap-layer gas concentrations: reuse the top-of-domain values
    sl = slice(None, 1) if top_at_1 else slice(-1, None)
    top_concs = {}
    for g in gas_desc.gas_names:
        v = gas_desc.get_raw(g)
        top_concs[g] = v if v.ndim == 0 else (v[..., sl] if v.ndim == 1 else v[:, sl])
    gd = GasConcs(top_concs)

    if mu0 is None:
        props, sources = gas_optics_lw_lut(
            kd, play, plev, tlay, tlay_top, gd, tlev=tlev, top_at_1=True
        )
        emis = jnp.ones((ncol, kd.nband), dtype)
        sol = rte_lw(props, True, sources, emis)
        return sol.flux_dn[:, -1, :]
    props, src = gas_optics_sw_lut(kd, play, plev, tlay, gd)
    alb = jnp.zeros((ncol, kd.ngpt), dtype)
    sol = rte_sw(props, True, mu0, src.toa_source, alb, alb)
    return sol.flux_dn[:, -1, :]
