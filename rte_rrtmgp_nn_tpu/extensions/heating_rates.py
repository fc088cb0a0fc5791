"""Heating rates from flux profiles.

Reference parity: ``extensions/mo_heating_rates.F90:48-52``:
    HR [K/s] = g/cp * d(F_net)/dp,   F_net = F_dn - F_up
(per layer, from the level fluxes bracketing it), plus the K/day variant
used by the eval drivers (rrtmgp_lw_eval_nn_rfmip.F90 calc_heating_rate).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import constants

SECONDS_PER_DAY = 86400.0


def compute_heating_rate(flux_up: jnp.ndarray, flux_dn: jnp.ndarray, plev: jnp.ndarray) -> jnp.ndarray:
    """Layer heating rate [K/s].

    flux_up/flux_dn: (ncol, nlay+1) broadband level fluxes;
    plev: (ncol, nlay+1) level pressures [Pa]. Returns (ncol, nlay).
    """
    net = flux_dn - flux_up
    dnet = net[:, 1:] - net[:, :-1]
    dp = plev[:, 1:] - plev[:, :-1]
    return constants.grav / constants.cp_dry * dnet / dp


def compute_heating_rate_kday(flux_up, flux_dn, plev) -> jnp.ndarray:
    """Heating rate in K/day, the unit of the training-eval metrics."""
    return compute_heating_rate(flux_up, flux_dn, plev) * SECONDS_PER_DAY
