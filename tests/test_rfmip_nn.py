"""End-to-end RFMIP clear-sky tests with the shipped NN models.

No golden flux files ship with the reference (CI downloads them), so these
tests validate physics: OLR magnitudes, surface fluxes, energy ordering,
and consistency across scenarios -- plus the totplnk-from-physics check
that the Planck table integrates to sigma*T^4.
"""
import os

import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.drivers.rfmip import rfmip_clear_sky_lw, rfmip_clear_sky_sw
from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
from rte_rrtmgp_nn_tpu.gasoptics.planck import (
    LW_BAND_LIMS_WVN,
    PlanckTable,
    planck_band_radiance,
)
from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

DATA = "/root/reference/neural/data"
SIGMA = 5.670374419e-8


@pytest.fixture(scope="module")
def rfmip(rfmip_file):
    return read_rfmip(rfmip_file)


@pytest.fixture(scope="module")
def lw_models():
    p = os.path.join(DATA, "lw-g128-210809_both_BEST.nc")
    if not os.path.exists(p):
        pytest.skip("LW NN model not available")
    return [load_model_netcdf(p)]


@pytest.fixture(scope="module")
def lw_models_2net():
    ps = [
        os.path.join(DATA, "lw-g128-210809_absorption_BEST.nc"),
        os.path.join(DATA, "lw-g128-210809_planck_frac_BEST.nc"),
    ]
    if not all(os.path.exists(p) for p in ps):
        pytest.skip("LW NN models not available")
    return [load_model_netcdf(p) for p in ps]


@pytest.fixture(scope="module")
def sw_models():
    ps = [
        os.path.join(DATA, "sw-g112-210809_absorption_BEST.nc"),
        os.path.join(DATA, "sw-g112-210809_rayleigh_BEST.nc"),
    ]
    if not all(os.path.exists(p) for p in ps):
        pytest.skip("SW NN models not available")
    return [load_model_netcdf(p) for p in ps]


class TestPlanckPhysics:
    def test_band_sum_is_stefan_boltzmann(self):
        """Sum of LW band Planck radiances ~ sigma T^4 / pi (the 10-3250
        cm-1 range covers >99.5% of the 160-355 K Planck emission)."""
        for T in (200.0, 260.0, 320.0):
            total = planck_band_radiance(np.array([T]), LW_BAND_LIMS_WVN).sum()
            expect = SIGMA * T**4 / np.pi
            assert abs(total - expect) / expect < 0.01

    def test_table_interpolation(self):
        import jax.numpy as jnp

        tbl = PlanckTable.compute(LW_BAND_LIMS_WVN, dtype=jnp.float64)
        t = jnp.asarray([255.3])
        exact = planck_band_radiance(np.array([255.3]), LW_BAND_LIMS_WVN)[0]
        interp = np.asarray(tbl.interpolate(t))[0]
        # 1 K table spacing gives ~4e-4 linear-interpolation error
        np.testing.assert_allclose(interp, exact, rtol=1e-3)


class TestRFMIPReading:
    def test_shapes(self, rfmip):
        assert rfmip.nexp == 18 and rfmip.nsites == 100 and rfmip.nlay == 60
        assert rfmip.play.shape == (1800, 60)
        assert rfmip.plev.shape == (1800, 61)
        assert "h2o" in rfmip.gas_concs and "co2" in rfmip.gas_concs

    def test_gas_units_scaling(self, rfmip):
        co2 = np.asarray(rfmip.gas_concs.get_raw("co2"))
        # present-day experiment should be a few hundred ppm
        assert 1e-4 < co2.max() < 3e-3 and co2.min() > 1e-4

    def test_orientation(self, rfmip):
        # RFMIP files are surface-first or top-first; the flag must match
        if rfmip.top_at_1:
            assert rfmip.play[0, 0] < rfmip.play[0, -1]
        else:
            assert rfmip.play[0, 0] > rfmip.play[0, -1]


class TestLWEndToEnd:
    def test_flux_sanity_both_model(self, rfmip, lw_models):
        block = rfmip.block(0, 100)  # experiment 1 (present-day), all sites
        fb = rfmip_clear_sky_lw(block, lw_models)
        up = np.asarray(fb.flux_up)
        dn = np.asarray(fb.flux_dn)
        assert up.shape == (100, 61)
        assert np.all(np.isfinite(up)) and np.all(np.isfinite(dn))
        # OLR (TOA up) in physical range for clear sky
        toa_idx = 0 if rfmip.top_at_1 else -1
        sfc_idx = -1 if rfmip.top_at_1 else 0
        olr = up[:, toa_idx]
        assert olr.min() > 80.0 and olr.max() < 400.0
        # Downward at TOA = 0, at surface positive and below sigma*T^4
        np.testing.assert_allclose(dn[:, toa_idx], 0.0, atol=1e-5)
        sfc_dn = dn[:, sfc_idx]
        assert np.all(sfc_dn > 20.0)
        tsfc = np.asarray(block.tsfc)
        assert np.all(sfc_dn < SIGMA * tsfc**4 * 1.05)
        # Surface upward close to emis*sigma*T^4 + reflection
        sfc_up = up[:, sfc_idx]
        bb = SIGMA * tsfc**4
        assert np.all(sfc_up > 0.8 * bb) and np.all(sfc_up < 1.1 * bb)

    def test_two_net_close_to_both(self, rfmip, lw_models, lw_models_2net):
        """Separate absorption+pfrac models vs the combined model: same
        physics, different networks -- fluxes should agree to a few W/m2."""
        block = rfmip.block(0, 50)
        f1 = rfmip_clear_sky_lw(block, lw_models)
        f2 = rfmip_clear_sky_lw(block, lw_models_2net)
        d = np.abs(np.asarray(f1.flux_up) - np.asarray(f2.flux_up))
        assert np.mean(d) < 3.0 and np.max(d) < 15.0

    def test_reference_smoke_value(self, rfmip, lw_models):
        """The reference driver prints 'mean of flux_down is: 103.2458' for
        the full 1800-column RFMIP LW run (rrtmgp_rfmip_lw.F90:480). Our
        totplnk is computed from physics rather than read from the k-dist
        file, so agreement to ~0.5 W/m2 validates the whole NN path."""
        fb = rfmip_clear_sky_lw(rfmip, lw_models)
        mean_dn = float(np.mean(np.asarray(fb.flux_dn)))
        assert abs(mean_dn - 103.2458) < 0.5, mean_dn

    def test_forcing_direction_co2(self, rfmip, lw_models):
        """Future-scenario experiments (higher CO2) should reduce OLR
        relative to pre-industrial at fixed T -- checked via experiments in
        the file whose only difference is composition."""
        # exp 0 = present, others vary; just check experiment spread is sane
        fb = rfmip_clear_sky_lw(rfmip.block(0, 300), lw_models)
        olr = np.asarray(fb.flux_up)[:, 0 if rfmip.top_at_1 else -1]
        assert olr.std() > 1.0  # scenarios actually differ


class TestSWEndToEnd:
    def test_flux_sanity(self, rfmip, sw_models):
        block = rfmip.block(0, 100)
        fb = rfmip_clear_sky_sw(block, sw_models)
        up = np.asarray(fb.flux_up)
        dn = np.asarray(fb.flux_dn)
        dnd = np.asarray(fb.flux_dn_dir)
        assert np.all(np.isfinite(up)) and np.all(np.isfinite(dn))
        toa_idx = 0 if rfmip.top_at_1 else -1
        day = np.asarray(block.sza) < 90.0
        # TOA downward equals TSI*mu0 for day columns
        mu0 = np.cos(np.deg2rad(np.asarray(block.sza)))
        expect = np.asarray(block.tsi) * mu0
        np.testing.assert_allclose(dn[day, toa_idx], expect[day], rtol=1e-4)
        # night columns zeroed
        assert np.all(dn[~day] == 0.0) and np.all(up[~day] == 0.0)
        # direct <= total downward everywhere
        assert np.all(dnd <= dn + 1e-4)
        # upward at TOA below incident (energy conservation)
        assert np.all(up[day, toa_idx] <= expect[day])


def test_lay_major_cores_match_col_major(rfmip, lw_models, sw_models):
    """The layer-major fast paths must stay numerically identical to the
    column-major cores (same physics, different array layout)."""
    import functools

    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        _lw_core,
        _lw_core_lay_major,
        _sw_core,
        _sw_core_lay_major,
        default_solar_source,
    )
    from rte_rrtmgp_nn_tpu.gasoptics.planck import (
        PlanckTable,
        lw_spectral_g128,
        sw_spectral_g112,
    )

    data = rfmip
    dt = jnp.float32
    n = 48
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=dt)
    concs = {k: jnp.asarray(v[:n] if np.ndim(v) == 2 else v, dt)
             for k, v in data.gas_concs.concs.items()}
    lw_args = (
        jnp.asarray(data.play[:n], dt), jnp.asarray(data.plev[:n], dt),
        jnp.asarray(data.tlay[:n], dt), jnp.asarray(data.tlev[:n], dt),
        jnp.asarray(data.tsfc[:n], dt),
        jnp.broadcast_to(jnp.asarray(data.sfc_emis[:n], dt)[:, None], (n, spec.nband)),
        concs,
    )
    ref = jax.jit(functools.partial(
        _lw_core, lw_models, table, spec, top_at_1=data.top_at_1,
        n_gauss_angles=1, scan_mode="sequential"))(*lw_args)
    new = jax.jit(functools.partial(
        _lw_core_lay_major, lw_models, table, spec, top_at_1=data.top_at_1))(*lw_args)
    np.testing.assert_allclose(np.asarray(new.flux_up), np.asarray(ref.flux_up), atol=1e-4)
    np.testing.assert_allclose(np.asarray(new.flux_dn), np.asarray(ref.flux_dn), atol=1e-4)

    swspec = sw_spectral_g112()
    solar = jnp.asarray(default_solar_source(swspec), dt)
    mu0 = jnp.asarray(np.cos(np.deg2rad(data.sza[:n])), dt)
    sw_args = (
        jnp.asarray(data.play[:n], dt), jnp.asarray(data.plev[:n], dt),
        jnp.asarray(data.tlay[:n], dt), jnp.asarray(data.sfc_alb[:n], dt),
        mu0, jnp.asarray(data.sza[:n] < 90.0), jnp.asarray(data.tsi[:n], dt), concs,
    )
    sref = jax.jit(functools.partial(
        _sw_core, sw_models, swspec, solar, top_at_1=data.top_at_1,
        scan_mode="sequential"))(*sw_args)
    snew = jax.jit(functools.partial(
        _sw_core_lay_major, sw_models, swspec, solar, top_at_1=data.top_at_1))(*sw_args)
    np.testing.assert_allclose(np.asarray(snew.flux_up), np.asarray(sref.flux_up), atol=1e-3)
    np.testing.assert_allclose(np.asarray(snew.flux_dn), np.asarray(sref.flux_dn), atol=1e-3)


def test_lw_g256_unreduced_models(rfmip):
    """The unreduced g-256 LW two-net family (absorption + planck_frac,
    canonical 16-point weights per band) runs end-to-end and lands at the
    reference flux level (full-RFMIP mean dn 103.06 when run full-size;
    here a subset with a wider gate)."""
    from rte_rrtmgp_nn_tpu.drivers.rfmip import rfmip_clear_sky_lw
    from rte_rrtmgp_nn_tpu.gasoptics.planck import lw_spectral_g256

    ps = [
        os.path.join(DATA, "lw-g256-2018-12-04_absorption_BEST.nc"),
        os.path.join(DATA, "lw-g256-2018-12-04_planck_frac_BEST.nc"),
    ]
    if not all(os.path.exists(p) for p in ps):
        pytest.skip("g256 models not available")
    models = [load_model_netcdf(p) for p in ps]
    assert models[0].n_outputs == 256 and models[1].n_outputs == 256

    small = rfmip.block(0, 90)
    fb = rfmip_clear_sky_lw(small, models, spectral=lw_spectral_g256())
    dn = float(np.mean(np.asarray(fb.flux_dn)))
    up = float(np.mean(np.asarray(fb.flux_up)))
    assert np.isfinite(np.asarray(fb.flux_dn)).all()
    assert 80.0 < dn < 130.0 and 250.0 < up < 350.0
