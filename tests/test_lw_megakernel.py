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
from rte_rrtmgp_nn_tpu.ops.pallas.lw_megakernel import (
    lw_clearsky_mega3,
    lw_clearsky_megakernel,
)

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
    up, dn = lw_clearsky_megakernel(
        m, jnp.moveaxis(x, 0, 1), cd.T, table.interpolate(tlay.T),
        table.interpolate(tlev.T), table.interpolate(tsfc), one_hot, emis,
        tile_c=8, interpret=True,
    )
    # f32 accumulation order differs (per-layer vs flattened-batch GEMMs):
    # absolute agreement at the 1e-3 W/m2 level on ~100-400 W/m2 fluxes
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref.flux_up), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(ref.flux_dn), atol=2e-3)

    # mega3: bit-exact phase A (host-interpolated band Planck) + VMEM sweeps
    up3, dn3 = lw_clearsky_mega3(
        m, jnp.moveaxis(x, 0, 1), cd.T, table.interpolate(tlay.T),
        table.interpolate(tlev.T), table.interpolate(tsfc), one_hot, emis,
        tile_c=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(up3), np.asarray(ref.flux_up), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dn3), np.asarray(ref.flux_dn), atol=2e-3)


def test_driver_megakernel_dispatch(rfmip_file):
    """config.use_megakernel=True routes rfmip_clear_sky_lw through the
    mega3 core (interpret mode off-TPU) and matches the staged default."""
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
