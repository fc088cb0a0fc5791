"""All-sky megakernel parity: the fused Pallas cores with in-kernel cloud
band->gpt expansion (lw_clearsky_mega4 cld_tau_band, sw_clearsky_megakernel
cld_bands) vs the staged lay-major all-sky cores, on the real Garand
atmosphere + shipped cloud-optics coefficients (interpret mode on CPU)."""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.config import config_override
from rte_rrtmgp_nn_tpu.drivers.allsky import (
    _allsky_lw_core_lay_major,
    _allsky_lw_core_mega,
    _allsky_sw_core_lay_major,
    _allsky_sw_core_mega,
    allsky_lw,
    allsky_sw,
    canonicalize_allsky_inputs,
    load_cloud_optics_checked,
    make_clouds,
)
from rte_rrtmgp_nn_tpu.drivers.allsky_io import read_garand
from rte_rrtmgp_nn_tpu.gasoptics.planck import (
    PlanckTable,
    lw_spectral_g128,
    sw_spectral_g112,
)
from rte_rrtmgp_nn_tpu.drivers.rfmip import default_solar_source
from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

D = "/root/reference/neural/data/"
G = "/root/reference/examples/all-sky/garand-atmos-1.nc"
CLW = "/root/reference/extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-lw.nc"
CSW = "/root/reference/extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-sw.nc"
NCOL = 48

pytestmark = pytest.mark.skipif(
    not (os.path.exists(G) and os.path.exists(CLW)),
    reason="all-sky data not available",
)


@pytest.fixture(scope="module")
def garand():
    return read_garand(G, NCOL)


def _common(atm, co):
    lwp, iwp, rel, rei = make_clouds(atm.play, atm.tlay, co)
    top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
    f32 = jnp.float32
    args = dict(
        play=jnp.asarray(atm.play, f32), plev=jnp.asarray(atm.plev, f32),
        tlay=jnp.asarray(atm.tlay, f32),
        lwp=jnp.asarray(lwp, f32), iwp=jnp.asarray(iwp, f32),
        rel=jnp.asarray(rel, f32), rei=jnp.asarray(rei, f32),
        concs={k: jnp.asarray(v, f32) for k, v in atm.gas_concs.concs.items()},
    )
    fields, concs_t = canonicalize_allsky_inputs(
        atm.play, atm.plev, atm.tlay, atm.tlev, lwp, iwp, rel, rei,
        atm.gas_concs, top_at_1)
    play_t, plev_t, tlay_t, tlev_t, lwp_t, iwp_t, rel_t, rei_t = (
        jnp.asarray(a, f32) for a in fields)
    canon = dict(
        play_t=play_t, plev_t=plev_t, tlay_t=tlay_t, tlev_t=tlev_t,
        lwp_t=lwp_t, iwp_t=iwp_t, rel_t=rel_t, rei_t=rei_t,
        concs_t={k: jnp.asarray(v, f32) for k, v in concs_t.items()},
    )
    return args, canon, top_at_1


class TestLWAllSkyMega:
    def test_matches_lay_major(self, garand):
        spectral = lw_spectral_g128()
        co = load_cloud_optics_checked(CLW)
        table = PlanckTable.compute(spectral.band_lims_wvn_array)
        models = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
        args, canon, top_at_1 = _common(garand, co)
        sfc_lev = -1 if top_at_1 else 0
        tsfc = jnp.asarray(garand.tlev[:, sfc_lev], jnp.float32)
        emis = jnp.full((NCOL, spectral.nband), 0.98, jnp.float32)
        kw = dict(args)
        kw.update(tlev=jnp.asarray(garand.tlev, jnp.float32),
                  tsfc=tsfc, emis_band=emis)
        kwm = dict(canon)
        kwm.update(tsfc=tsfc, emis_band=emis)

        ref = _allsky_lw_core_lay_major(
            models, table, spectral, co, top_at_1=top_at_1, **kw)
        got = _allsky_lw_core_mega(
            models, table, spectral, co, top_at_1=top_at_1, **kwm)

        np.testing.assert_allclose(
            np.asarray(got.flux_dn), np.asarray(ref.flux_dn),
            rtol=2e-6, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(got.flux_up), np.asarray(ref.flux_up),
            rtol=2e-6, atol=5e-3)
        # clouds actually matter in this comparison: zero-cloud run differs
        kw0 = dict(kwm)
        z = jnp.zeros_like(kwm["lwp_t"])
        kw0.update(lwp_t=z, iwp_t=z, rel_t=z, rei_t=z)
        clear = _allsky_lw_core_mega(
            models, table, spectral, co, top_at_1=top_at_1, **kw0)
        assert float(jnp.max(jnp.abs(clear.flux_dn - got.flux_dn))) > 1.0

    def test_public_api_dispatch(self, garand):
        models = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
        with config_override(use_megakernel=True):
            fb_mega = allsky_lw(G, CLW, models, ncol=NCOL)
        with config_override(use_megakernel=False):
            fb_ref = allsky_lw(G, CLW, models, ncol=NCOL)
        np.testing.assert_allclose(
            np.asarray(fb_mega.flux_dn), np.asarray(fb_ref.flux_dn),
            rtol=2e-6, atol=5e-3)


class TestSWAllSkyMega:
    def test_matches_lay_major(self, garand):
        spectral = sw_spectral_g112()
        co = load_cloud_optics_checked(CSW)
        models = [
            load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
            load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc"),
        ]
        solar = jnp.asarray(default_solar_source(spectral), jnp.float32)
        args, canon, top_at_1 = _common(garand, co)
        mu0 = jnp.full((NCOL,), 0.86, jnp.float32)
        alb = jnp.full((NCOL, spectral.nband), 0.06, jnp.float32)
        kw = dict(args)
        kw.update(mu0=mu0, sfc_alb_dir=alb, sfc_alb_dif=alb)
        kwm = {k: v for k, v in canon.items() if k != "tlev_t"}
        kwm.update(mu0=mu0, sfc_alb_dir=alb, sfc_alb_dif=alb)

        ref = _allsky_sw_core_lay_major(
            models, spectral, solar, co, top_at_1=top_at_1, **kw)
        got = _allsky_sw_core_mega(
            models, spectral, solar, co, top_at_1=top_at_1, **kwm)

        np.testing.assert_allclose(
            np.asarray(got.flux_dn), np.asarray(ref.flux_dn),
            rtol=3e-6, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(got.flux_up), np.asarray(ref.flux_up),
            rtol=3e-6, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(got.flux_dn_dir), np.asarray(ref.flux_dn_dir),
            rtol=3e-6, atol=2e-2)

    def test_public_api_dispatch(self, garand):
        models = [
            load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
            load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc"),
        ]
        with config_override(use_megakernel=True):
            fb_mega = allsky_sw(G, CSW, models, ncol=NCOL)
        with config_override(use_megakernel=False):
            fb_ref = allsky_sw(G, CSW, models, ncol=NCOL)
        np.testing.assert_allclose(
            np.asarray(fb_mega.flux_dn), np.asarray(fb_ref.flux_dn),
            rtol=3e-6, atol=2e-2)


class TestGCMMegaSweep:
    def test_gcm_allsky_mega_matches_staged(self, garand):
        """The streamed GCM all-sky sweep with the megakernel cores
        (in-jit canonicalization) matches the staged lay-major sweep."""
        from rte_rrtmgp_nn_tpu.drivers.gcm import (
            gcm_sweep_allsky,
            synthesize_gcm_columns,
        )
        from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
        from rte_rrtmgp_nn_tpu.extensions.cloud_optics import load_cloud_optics

        rfmip = ("/root/reference/examples/rfmip-clear-sky/"
                 "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc")
        if not os.path.exists(rfmip):
            pytest.skip("reference data not available")
        D = "/root/reference/neural/data/"
        base = read_rfmip(rfmip)
        host = synthesize_gcm_columns(base, 300)
        lw = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
        sw = [load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
              load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc")]
        clw = load_cloud_optics(CLW)
        csw = load_cloud_optics(CSW)
        with config_override(use_megakernel=False):
            ref = gcm_sweep_allsky(host, lw, sw, clw, csw, block_size=256,
                                   top_at_1=base.top_at_1)
        with config_override(use_megakernel=True):
            got = gcm_sweep_allsky(host, lw, sw, clw, csw, block_size=256,
                                   top_at_1=base.top_at_1)
        for key in ("mean_olr", "mean_lw_sfc_dn", "mean_sw_sfc_dn"):
            assert got[key] == pytest.approx(ref[key], abs=2e-2), key


class TestPadeBandLanePath:
    """The Pade coefficient route exercises the megakernels' BAND-LANE
    cloud inputs (cld_tau_band / cld_bands), which the default LUT route
    bypasses (it runs the in-kernel LUT path)."""

    def test_lw_pade_band_lanes_match_staged(self, garand):
        from rte_rrtmgp_nn_tpu.extensions.cloud_optics import load_cloud_optics

        spectral = lw_spectral_g128()
        co = load_cloud_optics(CLW, prefer="pade")
        assert not co.is_lut
        table = PlanckTable.compute(spectral.band_lims_wvn_array)
        models = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
        args, canon, top_at_1 = _common(garand, co)
        sfc_lev = -1 if top_at_1 else 0
        tsfc = jnp.asarray(garand.tlev[:, sfc_lev], jnp.float32)
        emis = jnp.full((NCOL, spectral.nband), 0.98, jnp.float32)
        kw = dict(args)
        kw.update(tlev=jnp.asarray(garand.tlev, jnp.float32),
                  tsfc=tsfc, emis_band=emis)
        kwm = dict(canon)
        kwm.update(tsfc=tsfc, emis_band=emis)

        ref = _allsky_lw_core_lay_major(
            models, table, spectral, co, top_at_1=top_at_1, **kw)
        got = _allsky_lw_core_mega(
            models, table, spectral, co, top_at_1=top_at_1, **kwm)
        np.testing.assert_allclose(
            np.asarray(got.flux_dn), np.asarray(ref.flux_dn),
            rtol=2e-6, atol=5e-3)

    def test_sw_pade_band_lanes_match_staged(self, garand):
        from rte_rrtmgp_nn_tpu.extensions.cloud_optics import load_cloud_optics

        spectral = sw_spectral_g112()
        co = load_cloud_optics(CSW, prefer="pade")
        assert not co.is_lut
        models = [
            load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
            load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc"),
        ]
        solar = jnp.asarray(default_solar_source(spectral), jnp.float32)
        args, canon, top_at_1 = _common(garand, co)
        mu0 = jnp.full((NCOL,), 0.86, jnp.float32)
        alb = jnp.full((NCOL, spectral.nband), 0.06, jnp.float32)
        kw = dict(args)
        kw.update(mu0=mu0, sfc_alb_dir=alb, sfc_alb_dif=alb)
        kwm = {k: v for k, v in canon.items() if k != "tlev_t"}
        kwm.update(mu0=mu0, sfc_alb_dir=alb, sfc_alb_dif=alb)

        ref = _allsky_sw_core_lay_major(
            models, spectral, solar, co, top_at_1=top_at_1, **kw)
        got = _allsky_sw_core_mega(
            models, spectral, solar, co, top_at_1=top_at_1, **kwm)
        np.testing.assert_allclose(
            np.asarray(got.flux_dn), np.asarray(ref.flux_dn),
            rtol=3e-6, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(got.flux_up), np.asarray(ref.flux_up),
            rtol=3e-6, atol=2e-2)


class TestDeltaScaleSubtractionForm:
    def test_cloud_combine_matches_classic_chain(self):
        """_cloud_combine's subtraction-form delta_scale (round 5:
        u = tsg^2/taussa; tau_b - u, taussa - u, tsg - u) must match the
        classic 6-divide chain (optical_props.py delta_scale semantics)
        computed in f64, across the physical range incl. cloud-free rows
        (tsg = taussa = 0) and strongly forward-scattering clouds."""
        from rte_rrtmgp_nn_tpu.ops.pallas.sw_megakernel import _cloud_combine

        rng = np.random.default_rng(0)
        n, nband = 257, 14
        f32 = np.float32
        tau_b = rng.uniform(0.0, 30.0, (n, nband))
        ssa_b = rng.uniform(0.3, 0.9999, (n, nband))
        g_b = rng.uniform(0.0, 0.9, (n, nband))
        clear = rng.random((n, nband)) < 0.4
        tau_b[clear] = 0.0
        taussa = tau_b * ssa_b
        tsg = taussa * g_b
        tau_gas = rng.uniform(1e-4, 5.0, (n, nband))
        ssa_gas = rng.uniform(0.0, 0.9, (n, nband))
        oh = np.eye(nband, dtype=f32)  # identity band->gpt: pure algebra

        eps = float(np.finfo(np.float32).eps)
        got = _cloud_combine(*(jnp.asarray(a, f32) for a in
                               (tau_b * 0.6, taussa * 0.6, tsg * 0.6,
                                tau_b * 0.4, taussa * 0.4, tsg * 0.4)),
                             jnp.asarray(tau_gas, f32),
                             jnp.asarray(ssa_gas, f32),
                             jnp.asarray(oh), eps)

        # classic chain in f64 (the truth)
        tb, ts, tg = tau_b, taussa, tsg
        g64 = np.where(ts > 0, tg / np.maximum(eps, ts), 0.0)
        s64 = np.where(tb > 0, ts / np.maximum(eps, tb), 0.0)
        f = g64 * g64
        wf = s64 * f
        tau_d = tb * (1.0 - wf)
        g_d = (g64 - f) / np.maximum(eps, 1.0 - f)
        ssa_d = (s64 - wf) / np.maximum(eps, 1.0 - wf)
        tsc_d = tau_d * ssa_d
        tau = tau_gas + tau_d
        tauscat = tau_gas * ssa_gas + tsc_d
        g = (tsc_d * g_d) / np.maximum(eps, tauscat)
        ssa = tauscat / np.maximum(eps, tau)

        np.testing.assert_allclose(np.asarray(got[0]), tau, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(got[1]), ssa,
                                   rtol=3e-5, atol=3e-6)
        np.testing.assert_allclose(np.asarray(got[2]), g,
                                   rtol=5e-5, atol=3e-6)
