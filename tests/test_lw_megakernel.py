"""Interpret-mode parity for the fused LW clear-sky megakernel
(ops/pallas/lw_megakernel.py): NN gas optics + Planck sources + both
transport sweeps in one kernel must match the staged XLA pipeline to f32
accumulation-order tolerance on real RFMIP columns."""
import numpy as np
import pytest

import jax.numpy as jnp

from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
from rte_rrtmgp_nn_tpu.gas_concs import GasConcs
from rte_rrtmgp_nn_tpu.gasoptics.nn_gas_optics import (
    compute_nn_inputs,
    get_col_dry,
    predict_nn_lw,
)
from rte_rrtmgp_nn_tpu.gasoptics.planck import (
    PlanckTable,
    compute_planck_source_nn,
    lw_spectral_g128,
)
from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf
from rte_rrtmgp_nn_tpu.ops.lw_solver import lw_solver_noscat
from rte_rrtmgp_nn_tpu.ops.lw_solver import lw_broadband_sweeps
from rte_rrtmgp_nn_tpu.ops.pallas.lw_megakernel import lw_prep_pallas

RFMIP = ("/root/reference/examples/rfmip-clear-sky/"
         "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc")
MODEL = "/root/reference/neural/data/lw-g128-210809_both_BEST.nc"


def test_megakernel_matches_staged_pipeline(rfmip_file):
    import os

    if not os.path.exists(MODEL):
        pytest.skip("model not available")
    dt = jnp.float32
    data = read_rfmip(rfmip_file)
    m = load_model_netcdf(MODEL)
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=dt)
    n, nlay = 20, 60
    play = jnp.asarray(data.play[:n], dt)
    plev = jnp.asarray(data.plev[:n], dt)
    tlay = jnp.asarray(data.tlay[:n], dt)
    tlev = jnp.asarray(data.tlev[:n], dt)
    tsfc = jnp.asarray(data.tsfc[:n], dt)
    gd = GasConcs({k: jnp.asarray(v[:n] if np.ndim(v) == 2 else v, dt)
                   for k, v in data.gas_concs.concs.items()})
    emis = jnp.full((n, spec.ngpt), 0.98, dt)

    x = compute_nn_inputs(play, tlay, gd, m)
    cd = get_col_dry(gd.get_vmr("h2o", n, nlay), plev)
    tau, pfrac = predict_nn_lw([m], x, cd, use_pallas=False)
    lay, lev, sfc, _ = compute_planck_source_nn(pfrac, tlay, tlev, tsfc, spec, table)
    ref = lw_solver_noscat(tau, lay, lev, emis, sfc, broadband=True)

    one_hot = jnp.asarray(
        (np.asarray(spec.gpt2band)[None, :] == np.arange(spec.nband)[:, None]),
        jnp.float32,
    )
    # prep kernel (fused phase A) + XLA sweeps
    trans, src_dn, src_up, sfc_src = lw_prep_pallas(
        m, jnp.moveaxis(x, 0, 1), cd.T, table.interpolate(tlay.T),
        table.interpolate(tlev.T), table.interpolate(tsfc), one_hot,
        tile_c=8, interpret=True,
    )
    sol = lw_broadband_sweeps(trans, src_dn, src_up, emis, sfc_src)
    # f32 accumulation order differs (per-layer vs flattened-batch GEMMs):
    # absolute agreement at the 1e-3 W/m2 level on ~100-400 W/m2 fluxes
    np.testing.assert_allclose(
        np.asarray(sol.flux_up), np.asarray(ref.flux_up), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(sol.flux_dn), np.asarray(ref.flux_dn), atol=2e-3)


def test_mega4_missing_gas_scenario(rfmip_file):
    """Missing gases take the scenario-reference const-feature path in the
    mega4 kernel (the only user of the const block by default) and match
    the staged core."""
    import os

    if not os.path.exists(MODEL):
        pytest.skip("model not available")
    from rte_rrtmgp_nn_tpu.config import config_override
    from rte_rrtmgp_nn_tpu.drivers.rfmip import rfmip_clear_sky_lw

    data = read_rfmip(rfmip_file).block(0, 16)
    concs = dict(data.gas_concs.concs)
    for g in ("cfc11", "cfc12", "hfc134a"):
        concs.pop(g)
    import dataclasses

    data = dataclasses.replace(data, gas_concs=type(data.gas_concs)(concs))
    m = [load_model_netcdf(MODEL)]
    with config_override(nn_scenario_index=1):
        ref = rfmip_clear_sky_lw(data, m)
        with config_override(use_megakernel=True):
            out = rfmip_clear_sky_lw(data, m)
    np.testing.assert_allclose(
        np.asarray(out.flux_dn), np.asarray(ref.flux_dn), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.flux_up), np.asarray(ref.flux_up), atol=2e-3)


def test_driver_megakernel_dispatch(rfmip_file):
    """config.use_megakernel=True routes rfmip_clear_sky_lw through the
    mega4 core (interpret mode off-TPU) and matches the staged default."""
    import os

    if not os.path.exists(MODEL):
        pytest.skip("model not available")
    from rte_rrtmgp_nn_tpu.config import config_override
    from rte_rrtmgp_nn_tpu.drivers.rfmip import rfmip_clear_sky_lw

    data = read_rfmip(rfmip_file).block(0, 16)
    m = [load_model_netcdf(MODEL)]
    ref = rfmip_clear_sky_lw(data, m)  # staged (auto: off-TPU)
    with config_override(use_megakernel=True):
        out = rfmip_clear_sky_lw(data, m)
    np.testing.assert_allclose(
        np.asarray(out.flux_dn), np.asarray(ref.flux_dn), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.flux_up), np.asarray(ref.flux_up), atol=2e-3)


def test_numerics_flags_force_staged_fallback(rfmip_file):
    """fast_exponential / use_pade_source are hardcoded-exact in the mega4
    kernel, so the driver must fall back to the staged core (which honors
    them) whenever either flag is set -- fluxes must reflect the flag."""
    import os

    if not os.path.exists(MODEL):
        pytest.skip("model not available")
    from rte_rrtmgp_nn_tpu.config import config_override
    from rte_rrtmgp_nn_tpu.drivers.rfmip import rfmip_clear_sky_lw

    data = read_rfmip(rfmip_file).block(0, 16)
    m = [load_model_netcdf(MODEL)]
    with config_override(use_pade_source=True):
        ref = rfmip_clear_sky_lw(data, m)  # staged, Pade source
        with config_override(use_megakernel=True):
            out = rfmip_clear_sky_lw(data, m)  # must fall back -> identical
    np.testing.assert_array_equal(
        np.asarray(out.flux_dn), np.asarray(ref.flux_dn))
    # and the Pade source actually changed the answer vs the default form
    exact = rfmip_clear_sky_lw(data, m)
    assert float(np.max(np.abs(exact.flux_dn - ref.flux_dn))) > 1e-4


def test_mega5_matches_mega4(rfmip_file):
    """mega5 (separate raw lanes, in-kernel transform+scale, single
    (nlay+1)-level Planck interp) matches mega4 and the staged core on
    real columns -- the lane scaling is sub-then-multiply (<=1 ulp vs the
    staged divide), so agreement is at f32 accumulation-order level."""
    import os

    if not os.path.exists(MODEL):
        pytest.skip("model not available")
    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        _lw_core_lay_major,
        _lw_core_mega4_canon,
        _lw_core_mega5_canon,
        canonicalize_rfmip_inputs,
    )

    data = read_rfmip(rfmip_file).block(0, 24)
    m = [load_model_netcdf(MODEL)]
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array)
    play_t, plev_t, tlay_t, tlev_t, concs_t = canonicalize_rfmip_inputs(data)
    concs = {k: jnp.asarray(v, jnp.float32) for k, v in concs_t.items()}
    emis = jnp.broadcast_to(
        jnp.asarray(data.sfc_emis, jnp.float32)[:, None],
        (data.ncol, spec.nband))
    args = (jnp.asarray(play_t), jnp.asarray(plev_t), jnp.asarray(tlay_t),
            jnp.asarray(tlev_t), jnp.asarray(data.tsfc, jnp.float32),
            emis, concs)
    fb4 = _lw_core_mega4_canon(m, table, spec, *args, top_at_1=data.top_at_1,
                               tile_c=8)
    fb5 = _lw_core_mega5_canon(m, table, spec, *args, top_at_1=data.top_at_1,
                               tile_c=8)
    np.testing.assert_allclose(
        np.asarray(fb5.flux_up), np.asarray(fb4.flux_up), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(fb5.flux_dn), np.asarray(fb4.flux_dn), atol=2e-3)
    # and against the fully staged lay-major core
    stag = _lw_core_lay_major(
        m, table, spec, jnp.asarray(data.play, jnp.float32),
        jnp.asarray(data.plev, jnp.float32),
        jnp.asarray(data.tlay, jnp.float32),
        jnp.asarray(data.tlev, jnp.float32),
        jnp.asarray(data.tsfc, jnp.float32), emis,
        {k: jnp.asarray(v, jnp.float32)
         for k, v in data.gas_concs.concs.items()},
        top_at_1=data.top_at_1)
    np.testing.assert_allclose(
        np.asarray(fb5.flux_dn), np.asarray(stag.flux_dn), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(fb5.flux_up), np.asarray(stag.flux_up), atol=3e-3)


def test_mega5_column_major_front(rfmip_file):
    """The col-major _lw_core_mega5 wrapper (in-jit canon) matches the
    canonical-input path bit-for-bit."""
    import os

    if not os.path.exists(MODEL):
        pytest.skip("model not available")
    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        _lw_core_mega5,
        _lw_core_mega5_canon,
        canonicalize_rfmip_inputs,
    )

    data = read_rfmip(rfmip_file).block(0, 16)
    m = [load_model_netcdf(MODEL)]
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array)
    emis = jnp.broadcast_to(
        jnp.asarray(data.sfc_emis, jnp.float32)[:, None],
        (data.ncol, spec.nband))
    concs = {k: jnp.asarray(v, jnp.float32)
             for k, v in data.gas_concs.concs.items()}
    out = _lw_core_mega5(
        m, table, spec, jnp.asarray(data.play, jnp.float32),
        jnp.asarray(data.plev, jnp.float32),
        jnp.asarray(data.tlay, jnp.float32),
        jnp.asarray(data.tlev, jnp.float32),
        jnp.asarray(data.tsfc, jnp.float32), emis, concs,
        top_at_1=data.top_at_1, tile_c=8)
    play_t, plev_t, tlay_t, tlev_t, concs_t = canonicalize_rfmip_inputs(data)
    ref = _lw_core_mega5_canon(
        m, table, spec, jnp.asarray(play_t), jnp.asarray(plev_t),
        jnp.asarray(tlay_t), jnp.asarray(tlev_t),
        jnp.asarray(data.tsfc, jnp.float32), emis,
        {k: jnp.asarray(v, jnp.float32) for k, v in concs_t.items()},
        top_at_1=data.top_at_1, tile_c=8)
    np.testing.assert_array_equal(
        np.asarray(out.flux_dn), np.asarray(ref.flux_dn))
    np.testing.assert_array_equal(
        np.asarray(out.flux_up), np.asarray(ref.flux_up))


def test_mega4_sweep_stored_bit_exact(rfmip_file):
    """The stored-sweep mega4 variant (broadband reduction hoisted out of
    the transport loops, source scratches reused as radiance stores) is
    BIT-exact vs the fused-sweep default: identical floats summed over the
    same lane axis, only the loop structure changes."""
    import os

    if not os.path.exists(MODEL):
        pytest.skip("model not available")
    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        _lw_core_mega4_canon,
        canonicalize_rfmip_inputs,
    )

    data = read_rfmip(rfmip_file).block(0, 24)
    m = [load_model_netcdf(MODEL)]
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array)
    play_t, plev_t, tlay_t, tlev_t, concs_t = canonicalize_rfmip_inputs(data)
    emis = jnp.broadcast_to(
        jnp.asarray(data.sfc_emis, jnp.float32)[:, None],
        (data.ncol, spec.nband))
    args = (jnp.asarray(play_t), jnp.asarray(plev_t), jnp.asarray(tlay_t),
            jnp.asarray(tlev_t), jnp.asarray(data.tsfc, jnp.float32),
            emis, {k: jnp.asarray(v, jnp.float32) for k, v in concs_t.items()})
    ref = _lw_core_mega4_canon(m, table, spec, *args,
                               top_at_1=data.top_at_1, tile_c=8)
    got = _lw_core_mega4_canon(m, table, spec, *args,
                               top_at_1=data.top_at_1, tile_c=8,
                               sweep_stored=True)
    np.testing.assert_array_equal(
        np.asarray(got.flux_dn), np.asarray(ref.flux_dn))
    np.testing.assert_array_equal(
        np.asarray(got.flux_up), np.asarray(ref.flux_up))
