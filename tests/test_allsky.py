"""All-sky example tests: cloud optics + increments + solvers, vs the
reference's hard-coded smoke values (rrtmgp_allsky.F90:479,487).

Reference smoke values were produced with the LUT gas optics; ours use the
NN gas optics, so tolerances reflect NN-vs-LUT accuracy (<1%).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.drivers.allsky import allsky_lw, allsky_sw, make_clouds
from rte_rrtmgp_nn_tpu.drivers.allsky_io import read_garand
from rte_rrtmgp_nn_tpu.extensions.cloud_optics import cloud_optics, load_cloud_optics
from rte_rrtmgp_nn_tpu.extensions.heating_rates import compute_heating_rate_kday
from rte_rrtmgp_nn_tpu.gasoptics.planck import sw_spectral_g224
from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

D = "/root/reference/neural/data/"
G = "/root/reference/examples/all-sky/garand-atmos-1.nc"
CLW = "/root/reference/extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-lw.nc"
CSW = "/root/reference/extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-sw.nc"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(G) and os.path.exists(CLW)), reason="all-sky data not available"
)


class TestCloudOptics:
    def test_load_lut(self):
        co = load_cloud_optics(CLW)
        assert co.is_lut and co.nband == 16
        assert co.min_radius_liq == pytest.approx(2.5)
        assert co.lut_extliq.shape == (16, 20)

    def test_no_cloud_no_tau(self):
        co = load_cloud_optics(CLW)
        z = jnp.zeros((3, 5))
        op = cloud_optics(co, z, z, z, z)
        assert float(jnp.max(op.tau)) == 0.0

    def test_cloud_properties_physical(self):
        co = load_cloud_optics(CSW)
        lwp = jnp.full((2, 4), 50.0)
        iwp = jnp.full((2, 4), 20.0)
        rel = jnp.full((2, 4), 12.0)
        rei = jnp.full((2, 4), 30.0)
        op = cloud_optics(co, lwp, iwp, rel, rei)
        tau = np.asarray(op.tau)
        ssa = np.asarray(op.ssa)
        g = np.asarray(op.g)
        assert np.all(tau > 0)
        assert np.all((ssa > 0.3) & (ssa <= 1.0))  # SW clouds mostly scatter
        assert np.all((g > 0.6) & (g < 1.0))

    def test_ice_roughness(self):
        co = load_cloud_optics(CLW)
        iwp = jnp.full((1, 1), 10.0)
        z = jnp.zeros((1, 1))
        rei = jnp.full((1, 1), 30.0)
        t1 = np.asarray(cloud_optics(co.set_ice_roughness(1), z, iwp, z, rei).tau)
        t2 = np.asarray(cloud_optics(co.set_ice_roughness(2), z, iwp, z, rei).tau)
        assert not np.allclose(t1, t2)
        with pytest.raises(ValueError):
            co.set_ice_roughness(5)


class TestAllSkySmoke:
    def test_lw(self):
        m = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
        fb = allsky_lw(G, CLW, m, ncol=24)
        dn = float(np.mean(np.asarray(fb.flux_dn)))
        up = float(np.mean(np.asarray(fb.flux_up)))
        # reference (LUT): 144.144470 / 269.762390
        assert abs(dn - 144.144) < 2.0, dn
        assert abs(up - 269.762) < 2.0, up

    def test_sw_g112(self):
        ms = [
            load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
            load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc"),
        ]
        fs = allsky_sw(G, CSW, ms, ncol=24)
        dn = float(np.mean(np.asarray(fs.flux_dn)))
        up = float(np.mean(np.asarray(fs.flux_up)))
        # reference (LUT): 946.975098 / 325.290985. The calibrated solar
        # band fractions (planck.SW_SOLAR_BAND_FRAC_CAL, fitted by
        # scripts/calibrate_sw_solar.py) pin the g112 flagship to <0.2%.
        assert abs(dn - 946.975) < 0.2e-2 * 946.975, dn
        assert abs(up - 325.291) < 0.2e-2 * 325.291, up

    def test_sw_g224(self):
        ms = [
            load_model_netcdf(D + "sw-g224-2018-12-04-absorption_BEST.nc"),
            load_model_netcdf(D + "sw-g224-2018-12-04-rayleigh_BEST.nc"),
        ]
        fs = allsky_sw(G, CSW, ms, ncol=24, spectral=sw_spectral_g224())
        dn = float(np.mean(np.asarray(fs.flux_dn)))
        up = float(np.mean(np.asarray(fs.flux_up)))
        # the g112-calibrated solar fractions leave the unreduced g-224
        # models within 0.5% (their residual is NN-model error; see
        # scripts/calibrate_sw_solar.py)
        assert abs(dn - 946.975) < 0.5e-2 * 946.975, dn
        assert abs(up - 325.291) < 0.5e-2 * 325.291, up

    def test_clouds_increase_lw_down(self):
        """Clouds warm the surface in LW: cloudy dn at surface > clear."""
        m = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
        fb = allsky_lw(G, CLW, m, ncol=6)
        atm = read_garand(G, 6)
        top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
        sfc = -1 if top_at_1 else 0
        dn_sfc = np.asarray(fb.flux_dn)[:, sfc]
        # columns 3 and 6 (1-based) are clear (icol % 3 == 0)
        clear = dn_sfc[[2, 5]]
        cloudy = dn_sfc[[0, 1, 3, 4]]
        assert cloudy.min() > clear.max()


class TestHeatingRates:
    def test_zero_net_zero_heating(self):
        up = jnp.ones((2, 5)) * 100.0
        dn = jnp.ones((2, 5)) * 100.0
        plev = jnp.broadcast_to(jnp.linspace(100.0, 1000e2, 5), (2, 5))
        hr = compute_heating_rate_kday(up, dn, plev)
        np.testing.assert_allclose(np.asarray(hr), 0.0)

    def test_cooling_sign(self):
        """LW net flux divergence -> cooling: if net (dn-up) decreases with
        pressure, heating rate is negative."""
        ncol, nlev = 1, 4
        plev = jnp.asarray([[100.0, 300e2, 700e2, 1000e2]])
        up = jnp.asarray([[250.0, 240.0, 220.0, 200.0]])
        dn = jnp.asarray([[0.0, 30.0, 90.0, 150.0]])
        hr = compute_heating_rate_kday(up, dn, plev)
        # net increases downward here -> positive dnet/dp -> heating
        assert np.all(np.asarray(hr) > 0)


class TestLayMajorCoreParity:
    """The layer-major all-sky cores (default) must reproduce the generic
    column-major cores (cloud increment folded pre-solve vs increment of
    materialized props) to f32 accumulation order."""

    def test_lw_cores_match(self):
        m = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
        fast = allsky_lw(G, CLW, m, ncol=12)
        generic = allsky_lw(G, CLW, m, ncol=12, scan_mode="parallel")
        np.testing.assert_allclose(
            np.asarray(fast.flux_dn), np.asarray(generic.flux_dn),
            rtol=0, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(fast.flux_up), np.asarray(generic.flux_up),
            rtol=0, atol=2e-3)

    def test_sw_cores_match(self):
        ms = [load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
              load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc")]
        fast = allsky_sw(G, CSW, ms, ncol=12)
        generic = allsky_sw(G, CSW, ms, ncol=12, scan_mode="parallel")
        np.testing.assert_allclose(
            np.asarray(fast.flux_dn), np.asarray(generic.flux_dn),
            rtol=0, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(fast.flux_up), np.asarray(generic.flux_up),
            rtol=0, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(fast.flux_dn_dir), np.asarray(generic.flux_dn_dir),
            rtol=0, atol=2e-2)
