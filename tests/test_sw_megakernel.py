"""Interpret-mode parity for the fused SW clear-sky megakernel
(ops/pallas/sw_megakernel.py): both NN nets + PIFM two-stream + direct
beam + adding in one kernel must match the staged lay-major pipeline to
f32 accumulation-order tolerance on real RFMIP columns."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from rte_rrtmgp_nn_tpu.drivers.rfmip import _sw_core_lay_major, _sw_core_mega
from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
from rte_rrtmgp_nn_tpu.gasoptics.planck import sw_spectral_g112
from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

ABS = "/root/reference/neural/data/sw-g112-210809_absorption_BEST.nc"
RAY = "/root/reference/neural/data/sw-g112-210809_rayleigh_BEST.nc"


def test_sw_megakernel_matches_staged(rfmip_file):
    if not (os.path.exists(ABS) and os.path.exists(RAY)):
        pytest.skip("SW models not available")
    dt = jnp.float32
    data = read_rfmip(rfmip_file)
    models = [load_model_netcdf(ABS), load_model_netcdf(RAY)]
    spec = sw_spectral_g112()
    from rte_rrtmgp_nn_tpu.drivers.rfmip import resolve_solar_source

    solar = jnp.asarray(resolve_solar_source(spec), dt)

    n = 24  # includes night columns (sza >= 90) for the masking path
    mu0 = np.cos(np.deg2rad(data.sza[:n]))
    usecol = data.sza[:n] < 90.0 - 0.5 * np.finfo(np.float32).eps
    assert not usecol.all(), "subset should include night columns"
    args = (
        jnp.asarray(data.play[:n], dt), jnp.asarray(data.plev[:n], dt),
        jnp.asarray(data.tlay[:n], dt), jnp.asarray(data.sfc_alb[:n], dt),
        jnp.asarray(mu0, dt), jnp.asarray(usecol),
        jnp.asarray(data.tsi[:n], dt),
        {k: jnp.asarray(v[:n] if np.ndim(v) == 2 else v, dt)
         for k, v in data.gas_concs.concs.items()},
    )
    ref = _sw_core_lay_major(models, spec, solar, *args,
                             top_at_1=data.top_at_1)
    out = _sw_core_mega(models, spec, solar, *args,
                        top_at_1=data.top_at_1, tile_c=8)
    # f32 accumulation-order tolerance: the kernel's direct beam is a
    # sequential per-layer product of exp(-tau/mu0) while the staged path
    # is exp(-cumsum(tau/mu0)) -- mathematically identical, and the adding
    # recurrence 1/(1-r*alb) amplifies the last-ulp differences to ~1e-5
    # relative on ~1000 W/m2 SW fluxes.
    for name in ("flux_up", "flux_dn", "flux_dn_dir"):
        a = np.asarray(getattr(out, name))
        b = np.asarray(getattr(ref, name))
        np.testing.assert_allclose(a, b, atol=2e-2, err_msg=name)
    # night columns exactly zero
    np.testing.assert_array_equal(np.asarray(out.flux_dn)[~usecol], 0.0)


def test_driver_megakernel_dispatch(rfmip_file):
    """config.use_megakernel=True routes rfmip_clear_sky_sw through the
    fused SW core (interpret mode off-TPU) and matches the staged default."""
    if not (os.path.exists(ABS) and os.path.exists(RAY)):
        pytest.skip("SW models not available")
    from rte_rrtmgp_nn_tpu.config import config_override
    from rte_rrtmgp_nn_tpu.drivers.rfmip import rfmip_clear_sky_sw

    data = read_rfmip(rfmip_file).block(0, 16)
    models = [load_model_netcdf(ABS), load_model_netcdf(RAY)]
    ref = rfmip_clear_sky_sw(data, models)  # staged (auto: off-TPU)
    with config_override(use_megakernel=True):
        out = rfmip_clear_sky_sw(data, models)
    np.testing.assert_allclose(
        np.asarray(out.flux_dn), np.asarray(ref.flux_dn), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out.flux_up), np.asarray(ref.flux_up), atol=2e-2)


def test_sw_sweep_stored_bit_exact(rfmip_file):
    """The stored-sweep SW variant (direct-beam exp, source scaling, fup,
    and all broadband reductions hoisted out of the sequential loops) is
    BIT-exact vs the fused-sweep default: per element the same ops run in
    the same order, only the loop structure changes."""
    if not (os.path.exists(ABS) and os.path.exists(RAY)):
        pytest.skip("SW models not available")
    dt = jnp.float32
    data = read_rfmip(rfmip_file)
    models = [load_model_netcdf(ABS), load_model_netcdf(RAY)]
    spec = sw_spectral_g112()
    from rte_rrtmgp_nn_tpu.drivers.rfmip import resolve_solar_source

    solar = jnp.asarray(resolve_solar_source(spec), dt)
    n = 24
    mu0 = np.cos(np.deg2rad(data.sza[:n]))
    usecol = data.sza[:n] < 90.0 - 0.5 * np.finfo(np.float32).eps
    args = (
        jnp.asarray(data.play[:n], dt), jnp.asarray(data.plev[:n], dt),
        jnp.asarray(data.tlay[:n], dt), jnp.asarray(data.sfc_alb[:n], dt),
        jnp.asarray(mu0, dt), jnp.asarray(usecol),
        jnp.asarray(data.tsi[:n], dt),
        {k: jnp.asarray(v[:n] if np.ndim(v) == 2 else v, dt)
         for k, v in data.gas_concs.concs.items()},
    )
    ref = _sw_core_mega(models, spec, solar, *args,
                        top_at_1=data.top_at_1, tile_c=8)
    got = _sw_core_mega(models, spec, solar, *args,
                        top_at_1=data.top_at_1, tile_c=8, sweep_stored=True)
    for name in ("flux_up", "flux_dn", "flux_dn_dir"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            err_msg=name)


def test_sw_lane_list_matches_3d_input(rfmip_file):
    """The lane-list input form (production: per-lane scaled 2-D features
    + const/perm, assembled by the stack+barrier+transpose fast path) is
    BIT-identical to the 3-D pre-stacked back-compat form: the assembled
    operand holds the same f32 values, only the XLA assembly schedule
    differs (round-4 staging fix)."""
    if not (os.path.exists(ABS) and os.path.exists(RAY)):
        pytest.skip("SW models not available")
    from rte_rrtmgp_nn_tpu.gas_concs import GasConcs
    from rte_rrtmgp_nn_tpu.gasoptics.nn_gas_optics import (
        compute_nn_inputs,
        compute_nn_inputs_split,
        get_col_dry_lay_major,
    )
    from rte_rrtmgp_nn_tpu.ops.pallas.sw_megakernel import (
        sw_clearsky_megakernel,
    )

    dt = jnp.float32
    data = read_rfmip(rfmip_file)
    models = [load_model_netcdf(ABS), load_model_netcdf(RAY)]
    spec = sw_spectral_g112()
    n = 16
    nlay = data.play.shape[1]
    concs_t = {k: jnp.asarray(v[:n].T if np.ndim(v) == 2 else v, dt)
               for k, v in data.gas_concs.concs.items()}
    gd = GasConcs(concs_t)
    play_t = jnp.asarray(data.play[:n].T, dt)
    plev_t = jnp.asarray(data.plev[:n].T, dt)
    tlay_t = jnp.asarray(data.tlay[:n].T, dt)
    col_dry = get_col_dry_lay_major(gd.get_vmr("h2o", nlay, n), plev_t)
    mu0 = jnp.asarray(np.clip(np.cos(np.deg2rad(data.sza[:n])), 0.1, 1.0), dt)
    ngpt = spec.ngpt
    inc = jnp.broadcast_to(jnp.linspace(1.0, 2.0, ngpt, dtype=dt)[None, :],
                           (n, ngpt)) * mu0[:, None]
    alb = jnp.full((n, ngpt), 0.1, dt)

    x3d = compute_nn_inputs(play_t, tlay_t, gd, models[0])
    x2d, cf, perm = compute_nn_inputs_split(
        play_t, tlay_t, gd, models[0], (), lay_major=True)
    a = sw_clearsky_megakernel(models[0], models[1], x3d, col_dry, mu0,
                               inc, alb, alb, tile_c=8)
    b = sw_clearsky_megakernel(models[0], models[1], x2d, col_dry, mu0,
                               inc, alb, alb, tile_c=8,
                               const_feats=cf, perm=perm)
    # lanes-direct (separate well-tiled refs, in-VMEM feature assembly):
    # a measured chip REJECTION (docs/PERFORMANCE.md round 5) kept
    # selectable; numerics must stay bit-identical
    c = sw_clearsky_megakernel(models[0], models[1], x2d, col_dry, mu0,
                               inc, alb, alb, tile_c=8,
                               const_feats=cf, perm=perm,
                               input_mode="lanes")
    for name, u, v, w in zip(("up", "dn", "dir"), a, b, c):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v),
                                      err_msg=name)
        np.testing.assert_array_equal(np.asarray(u), np.asarray(w),
                                      err_msg=name + " (lanes)")
