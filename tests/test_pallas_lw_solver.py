"""Interpret-mode parity for the fused Pallas LW broadband solver.

The kernel (ops/pallas/lw_solver.py) hand-schedules the same physics as
the fused XLA scan path (ops/lw_solver.py _lw_noscat_broadband_fused,
reference mo_rte_solver_kernels.F90:119-330); these tests run it in
Pallas interpret mode on CPU and require float-roundoff agreement,
covering the padding path (ncol/nlay not tile/chunk multiples), nonzero
incident flux, per-(col, gpt) secants, and the config-flag dispatch.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.config import config as rte_config
from rte_rrtmgp_nn_tpu.ops.lw_solver import lw_solver_noscat
from rte_rrtmgp_nn_tpu.ops.pallas.lw_solver import lw_noscat_broadband_pallas


def _problem(rng, ncol, nlay, ngpt):
    tau = jnp.asarray(rng.uniform(1e-4, 3.0, (ncol, nlay, ngpt)), jnp.float32)
    lay = jnp.asarray(rng.uniform(0.1, 1.0, (ncol, nlay, ngpt)), jnp.float32)
    lev = jnp.asarray(rng.uniform(0.1, 1.0, (ncol, nlay + 1, ngpt)), jnp.float32)
    emis = jnp.asarray(rng.uniform(0.8, 1.0, (ncol, ngpt)), jnp.float32)
    sfc = jnp.asarray(rng.uniform(0.1, 1.0, (ncol, ngpt)), jnp.float32)
    return tau, lay, lev, emis, sfc


@pytest.mark.parametrize("ncol,nlay", [(70, 12), (130, 23)])
def test_pallas_matches_fused_scan(rng, ncol, nlay):
    ngpt = 128
    tau, lay, lev, emis, sfc = _problem(rng, ncol, nlay, ngpt)
    ref = lw_solver_noscat(tau, lay, lev, emis, sfc, broadband=True)
    up, dn = lw_noscat_broadband_pallas(
        tau, lay, lev, emis, sfc, chunk=5, interpret=True
    )
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref.flux_up), rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(ref.flux_dn), rtol=2e-6, atol=1e-5)


def test_pallas_inc_flux_and_secants(rng):
    ncol, nlay, ngpt = 40, 9, 128
    tau, lay, lev, emis, sfc = _problem(rng, ncol, nlay, ngpt)
    inc = jnp.asarray(rng.uniform(0.0, 5.0, (ncol, ngpt)), jnp.float32)
    ds = jnp.asarray(rng.uniform(1.5, 1.9, (ncol, ngpt)), jnp.float32)
    ref = lw_solver_noscat(tau, lay, lev, emis, sfc, inc_flux=inc,
                           lw_ds=ds, broadband=True)
    w = float(np.pi)  # two_pi_w with weight 0.5
    up, dn = lw_noscat_broadband_pallas(
        tau, lay, lev, emis, sfc, d_secant=ds, inc_rad=inc / (2.0 * w * 0.5),
        chunk=3, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref.flux_up), rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(ref.flux_dn), rtol=2e-6, atol=1e-5)


def test_config_flag_dispatch(rng):
    ncol, nlay, ngpt = 24, 8, 128
    tau, lay, lev, emis, sfc = _problem(rng, ncol, nlay, ngpt)
    ref = lw_solver_noscat(tau, lay, lev, emis, sfc, broadband=True)
    old = rte_config.use_pallas_lw_solver
    try:
        rte_config.use_pallas_lw_solver = True
        out = lw_solver_noscat(tau, lay, lev, emis, sfc, broadband=True)
    finally:
        rte_config.use_pallas_lw_solver = old
    np.testing.assert_allclose(
        np.asarray(out.flux_up), np.asarray(ref.flux_up), rtol=2e-6, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.flux_dn), np.asarray(ref.flux_dn), rtol=2e-6, atol=1e-5
    )
    # top_at_1=False exercises the flip wrappers around the dispatch
    ref2 = lw_solver_noscat(tau, lay, lev, emis, sfc, top_at_1=False, broadband=True)
    try:
        rte_config.use_pallas_lw_solver = True
        out2 = lw_solver_noscat(tau, lay, lev, emis, sfc, top_at_1=False, broadband=True)
    finally:
        rte_config.use_pallas_lw_solver = old
    np.testing.assert_allclose(
        np.asarray(out2.flux_dn), np.asarray(ref2.flux_dn), rtol=2e-6, atol=1e-5
    )
