"""LUT gas-optics front-ends: the interpolation path of gas_optics_int/ext.

Reference parity: ``mo_gas_optics_rrtmgp.F90`` ``gas_optics_int`` LUT branch
(:417-421 -> compute_gas_optics :803-1042) and ``gas_optics_ext``
(:433-602): interpolation -> tau_absorption -> [tau_rayleigh -> combine] ->
Planck source (LW) or solar source broadcast (SW).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..gas_concs import GasConcs
from ..optical_props import OpticalProps1scl, OpticalProps2str
from ..ops.gas_optics_lut import (
    compute_col_gas,
    compute_planck_source,
    compute_tau_absorption,
    compute_tau_rayleigh,
    interpolation,
)
from ..sources import SourceFuncLW, SourceFuncSW
from .kdist import KDist
from .nn_gas_optics import get_col_dry, interp_tlev


def gas_optics_lw_lut(
    kd: KDist,
    play: jnp.ndarray,
    plev: jnp.ndarray,
    tlay: jnp.ndarray,
    tsfc: jnp.ndarray,
    gas_desc: GasConcs,
    col_dry: Optional[jnp.ndarray] = None,
    tlev: Optional[jnp.ndarray] = None,
    top_at_1: bool = True,
    save_pfrac: bool = False,
):
    """LW LUT gas optics -> (OpticalProps1scl, SourceFuncLW)."""
    ncol, nlay = play.shape
    if tlev is None:
        tlev = interp_tlev(tlay, play, plev)
    if col_dry is None:
        col_dry = get_col_dry(gas_desc.get_vmr("h2o", ncol, nlay), plev)
    col_gas = compute_col_gas(kd, gas_desc, col_dry)
    ic = interpolation(kd, play, tlay, col_gas)
    tau = compute_tau_absorption(kd, ic, play, tlay, col_gas)
    out = compute_planck_source(kd, ic, tlay, tlev, tsfc, top_at_1, save_pfrac=save_pfrac)
    if save_pfrac:
        lay, lev, sfc, sfc_jac, pfrac = out
    else:
        lay, lev, sfc, sfc_jac = out
        pfrac = None
    sources = SourceFuncLW(
        lay_source=lay, lev_source=lev, sfc_source=sfc, sfc_source_jac=sfc_jac,
        spectral=kd.spectral, planck_frac=pfrac,
    )
    return OpticalProps1scl(tau, kd.spectral), sources


def gas_optics_sw_lut(
    kd: KDist,
    play: jnp.ndarray,
    plev: jnp.ndarray,
    tlay: jnp.ndarray,
    gas_desc: GasConcs,
    col_dry: Optional[jnp.ndarray] = None,
    tsi: Optional[float] = None,
):
    """SW LUT gas optics -> (OpticalProps2str, SourceFuncSW).

    tau = absorption + rayleigh; ssa = rayleigh/total; g = 0
    (reference combine_2str, mo_gas_optics_kernels.F90:1170-1272).
    """
    ncol, nlay = play.shape
    if col_dry is None:
        col_dry = get_col_dry(gas_desc.get_vmr("h2o", ncol, nlay), plev)
    col_gas = compute_col_gas(kd, gas_desc, col_dry)
    ic = interpolation(kd, play, tlay, col_gas)
    tau_abs = compute_tau_absorption(kd, ic, play, tlay, col_gas)
    tau_ray = compute_tau_rayleigh(kd, ic, col_gas, col_dry)
    tau_tot = tau_abs + tau_ray
    ssa = jnp.where(tau_tot > 0, tau_ray / jnp.where(tau_tot > 0, tau_tot, 1.0), 0.0)
    props = OpticalProps2str(tau_tot, ssa, jnp.zeros_like(tau_tot), kd.spectral)
    solar = kd.solar_source(tsi=tsi)
    toa_src = jnp.broadcast_to(solar[None, :], (ncol, kd.ngpt))
    return props, SourceFuncSW(toa_source=toa_src, spectral=kd.spectral)


def compute_optimal_angles(kd: KDist, tau: jnp.ndarray) -> jnp.ndarray:
    """Per-(col,gpt) optimal LW transport secants from a linear fit to
    column transmittance (reference compute_optimal_angles,
    mo_gas_optics_rrtmgp.F90:1712-1758)."""
    import numpy as np

    trans_total = jnp.exp(-jnp.sum(tau, axis=1))  # (ncol, ngpt)
    fit = jnp.asarray(np.asarray(kd.optimal_angle_fit))  # (nband, 2)
    g2b = jnp.asarray(kd.spectral.gpt2band)
    return fit[g2b, 0][None, :] * trans_total + fit[g2b, 1][None, :]
