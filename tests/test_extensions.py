"""Extension tests: McICA cloud sampling, solar variability, compute_bc,
clr_all_sky wrappers."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.extensions.cloud_sampling import (
    draw_samples_to,
    sampled_mask_exp_ran,
    sampled_mask_max_ran,
)
from rte_rrtmgp_nn_tpu.extensions.compute_bc import compute_bc
from rte_rrtmgp_nn_tpu.extensions.clr_all_sky import rte_lw_allsky, rte_sw_allsky
from rte_rrtmgp_nn_tpu.extensions.solar_variability import SolarVar
from rte_rrtmgp_nn_tpu.gasoptics.kdist import load_kdist
from rte_rrtmgp_nn_tpu.gasoptics.synthetic import generate_kdist_nc
from rte_rrtmgp_nn_tpu.optical_props import OpticalProps2str
from rte_rrtmgp_nn_tpu.spectral import SpectralMapping

from test_lut_gas_optics import GASES, make_atmosphere

SOLAR_VAR_FILE = "/root/reference/extensions/solar_variability/rrtmgp-solar-var-tables.nc"


@pytest.fixture(scope="module")
def lw_kd(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("kd") / "lw.nc")
    generate_kdist_nc(p, kind="lw", gpts_per_band=4, nband=16)
    return load_kdist(p, GASES)


@pytest.fixture(scope="module")
def sw_kd(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("kd") / "sw.nc")
    generate_kdist_nc(p, kind="sw", gpts_per_band=4, nband=14)
    return load_kdist(p, GASES)


class TestCloudSampling:
    def test_max_ran_statistics(self):
        """Sampled cloudy fraction over many g-points approximates the
        cloud fraction; clear layers stay clear."""
        key = jax.random.PRNGKey(0)
        ncol, nlay, ngpt = 4, 10, 2000
        randoms = jax.random.uniform(key, (ncol, nlay, ngpt))
        cf = jnp.zeros((ncol, nlay)).at[:, 3:7].set(0.4)
        mask = sampled_mask_max_ran(randoms, cf)
        frac = np.asarray(jnp.mean(mask.astype(jnp.float32), axis=-1))
        np.testing.assert_allclose(frac[:, 3:7], 0.4, atol=0.05)
        assert np.all(frac[:, :3] == 0.0) and np.all(frac[:, 7:] == 0.0)

    def test_max_ran_is_maximum_within_block(self):
        """Within a contiguous cloudy block of equal cloud fraction,
        maximum overlap means each g-point is cloudy in all layers or
        none."""
        key = jax.random.PRNGKey(1)
        randoms = jax.random.uniform(key, (2, 6, 512))
        cf = jnp.zeros((2, 6)).at[:, 1:5].set(0.5)
        mask = np.asarray(sampled_mask_max_ran(randoms, cf))
        block = mask[:, 1:5, :]
        assert np.all(block.all(axis=1) == block.any(axis=1))

    def test_exp_ran_reduces_to_max_at_rho_1(self):
        key = jax.random.PRNGKey(2)
        randoms = jax.random.uniform(key, (2, 8, 256))
        cf = jnp.full((2, 8), 0.3)
        rho = jnp.ones((2, 7))
        m_exp = np.asarray(sampled_mask_exp_ran(randoms, cf, rho))
        m_max = np.asarray(sampled_mask_max_ran(randoms, cf))
        np.testing.assert_array_equal(m_exp, m_max)

    def test_exp_ran_rho_zero_is_random(self):
        """rho = 0: layers are independent -> overlap of two layers'
        cloudy sets ~ product of fractions."""
        key = jax.random.PRNGKey(3)
        randoms = jax.random.uniform(key, (1, 2, 20000))
        cf = jnp.full((1, 2), 0.5)
        rho = jnp.zeros((1, 1))
        m = np.asarray(sampled_mask_exp_ran(randoms, cf, rho))
        both = np.mean(m[0, 0] & m[0, 1])
        assert abs(both - 0.25) < 0.02

    def test_draw_samples_to(self):
        nband, ngpt = 3, 12
        blg = np.stack([np.arange(3) * 4, (np.arange(3) + 1) * 4], 1)
        blw = np.stack([np.arange(3) * 100.0, (np.arange(3) + 1) * 100.0], 1)
        target = SpectralMapping.create(blg, blw)
        band_sm = SpectralMapping.bands_only(blw)
        clouds = OpticalProps2str(
            jnp.ones((2, 5, 3)) * jnp.asarray([1.0, 2.0, 3.0]),
            jnp.full((2, 5, 3), 0.9),
            jnp.full((2, 5, 3), 0.8),
            band_sm,
        )
        mask = jnp.zeros((2, 5, 12), bool).at[:, :, 5].set(True)
        out = draw_samples_to(target, mask, clouds)
        assert float(out.tau[0, 0, 5]) == 2.0  # gpt 5 is in band 1 (tau 2)
        assert float(out.tau[0, 0, 4]) == 0.0


class TestSolarVar:
    @pytest.mark.skipif(not os.path.exists(SOLAR_VAR_FILE), reason="table not shipped")
    def test_load_and_interp(self):
        sv = SolarVar.load(SOLAR_VAR_FILE)
        assert sv.avgcyc_ind.shape[0] == 2
        mg0, sb0 = sv.ind_interp(0.0)
        mg1, sb1 = sv.ind_interp(1.0)
        mgm, sbm = sv.ind_interp(0.5)
        assert np.isfinite([mg0, sb0, mg1, sb1, mgm, sbm]).all()
        # mid-cycle facular/sunspot activity exceeds cycle start
        assert mgm > mg0 and sbm > sb0
        with pytest.raises(ValueError):
            sv.ind_interp(1.5)

    @pytest.mark.skipif(not os.path.exists(SOLAR_VAR_FILE), reason="table not shipped")
    def test_continuity(self):
        sv = SolarVar.load(SOLAR_VAR_FILE)
        # dense sampling (several points per table cell) -> steps are tiny
        vals = [sv.ind_interp(f)[0] for f in np.linspace(0.01, 0.99, 801)]
        full_range = max(vals) - min(vals) + 1e-12
        assert np.max(np.abs(np.diff(vals))) < 0.05 * full_range


class TestComputeBC:
    def test_lw_bc_positive_small(self, lw_kd):
        ncol = 3
        tlay_top = jnp.full((ncol,), 250.0)
        plev_top = jnp.full((ncol,), 100.0)  # 1 hPa domain top
        bc = compute_bc(lw_kd, tlay_top, plev_top, _top_gas_concs())
        assert bc.shape == (ncol, lw_kd.ngpt)
        assert np.all(np.asarray(bc) >= 0)
        # the cap layer is thin: downward emission well below sigma T^4
        assert float(jnp.sum(bc, -1)[0]) < 5.670e-8 * 250.0**4

    def test_sw_bc(self, sw_kd):
        ncol = 2
        tlay_top = jnp.full((ncol,), 250.0)
        plev_top = jnp.full((ncol,), 100.0)
        mu0 = jnp.full((ncol,), 0.8)
        bc = compute_bc(sw_kd, tlay_top, plev_top, _top_gas_concs(), mu0=mu0)
        total = float(jnp.sum(bc, -1)[0])
        # near-total transmission of the thin cap: close to TSI*mu0
        assert 0.9 * 1360.85 * 0.8 < total <= 1360.85 * 0.8 * 1.001

    def test_gas_profile_orientation(self, lw_kd):
        """The cap layer must reuse the TOP-of-domain gas values in either
        orientation (reference samples layer 1 vs nlay,
        mo_compute_bc.F90) -- not unconditionally index 0."""
        from rte_rrtmgp_nn_tpu.gas_concs import GasConcs

        ncol, nlay = 3, 8
        tlay_top = jnp.full((ncol,), 250.0)
        plev_top = jnp.full((ncol,), 100.0)
        h2o = np.linspace(3e-6, 3e-3, nlay)  # dry top -> moist surface
        rest = {"co2": 4e-4, "o3": 1e-6, "n2o": 3.2e-7, "ch4": 1.8e-6}
        gd_top0 = GasConcs.create({"h2o": h2o, **rest})
        gd_sfc0 = GasConcs.create({"h2o": h2o[::-1].copy(), **rest})
        a = compute_bc(lw_kd, tlay_top, plev_top, gd_top0, top_at_1=True)
        b = compute_bc(lw_kd, tlay_top, plev_top, gd_sfc0, top_at_1=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # mis-stating the orientation feeds the moist SURFACE h2o to the
        # cap and changes the BC -- the slice is load-bearing
        c = compute_bc(lw_kd, tlay_top, plev_top, gd_sfc0, top_at_1=True)
        assert np.any(np.asarray(c) != np.asarray(a))


def _top_gas_concs():
    from rte_rrtmgp_nn_tpu.gas_concs import GasConcs

    return GasConcs.create(
        {"h2o": 3e-6, "co2": 4e-4, "o3": 1e-6, "n2o": 3.2e-7, "ch4": 1.8e-6}
    )


class TestClrAllSky:
    def test_lw_clouds_change_fluxes(self, lw_kd):
        play, plev, tlay, tlev, tsfc, gc = make_atmosphere(ncol=3, nlay=12)
        ncol, nlay = play.shape
        emis = jnp.full((ncol, lw_kd.nband), 0.98, play.dtype)
        band_sm = SpectralMapping.bands_only(lw_kd.spectral.band_lims_wvn_array)
        ctau = jnp.zeros((ncol, nlay, lw_kd.nband)).at[:, 6:9, :].set(5.0)
        clouds = OpticalProps2str(ctau, jnp.full_like(ctau, 0.5), jnp.full_like(ctau, 0.85), band_sm)
        allsky, clear = rte_lw_allsky(
            lw_kd, play, plev, tlay, tsfc, gc, emis, clouds=clouds, tlev=tlev, compute_clear=True
        )
        d = np.abs(np.asarray(allsky.flux_dn) - np.asarray(clear.flux_dn))
        assert d.max() > 1.0  # clouds matter

    def test_sw_wrapper(self, sw_kd):
        play, plev, tlay, tlev, tsfc, gc = make_atmosphere(ncol=2, nlay=12)
        ncol = play.shape[0]
        mu0 = jnp.full((ncol,), 0.75, play.dtype)
        alb = jnp.full((ncol, sw_kd.nband), 0.1, play.dtype)
        fb = rte_sw_allsky(sw_kd, play, plev, tlay, gc, mu0, alb, alb)
        assert np.all(np.isfinite(np.asarray(fb.flux_dn)))
        assert np.all(np.asarray(fb.flux_dn_dir) <= np.asarray(fb.flux_dn) + 1e-6)


class TestMcICAEndToEnd:
    def test_mcica_converges_to_cloud_fraction_average(self, lw_kd):
        """Full McICA chain: overlap-sampled g-point cloud masks ->
        draw_samples_to -> increment -> LW solve. With many g-points the
        McICA estimate of the all-sky flux approaches the
        cloud-fraction-weighted average of clear and overcast solves."""
        import jax

        from rte_rrtmgp_nn_tpu.extensions.cloud_sampling import (
            draw_samples_to,
            sampled_mask_max_ran,
        )
        from rte_rrtmgp_nn_tpu.gasoptics.lut_gas_optics import gas_optics_lw_lut
        from rte_rrtmgp_nn_tpu.optical_props import OpticalProps2str, increment
        from rte_rrtmgp_nn_tpu.rte import rte_lw
        from rte_rrtmgp_nn_tpu.fluxes import reduce_broadband

        play, plev, tlay, tlev, tsfc, gc = make_atmosphere(ncol=4, nlay=12)
        ncol, nlay = play.shape
        props, sources = gas_optics_lw_lut(lw_kd, play, plev, tlay, tsfc, gc, tlev=tlev)
        emis = jnp.full((ncol, lw_kd.nband), 0.98, play.dtype)
        band_sm = SpectralMapping.bands_only(lw_kd.spectral.band_lims_wvn_array)

        # single-layer cloud deck with fraction 0.5 at layers 6-8
        cf = jnp.zeros((ncol, nlay)).at[:, 6:9].set(0.5)
        ctau_band = jnp.where(
            (cf > 0)[:, :, None], 4.0, 0.0
        ) * jnp.ones((1, 1, lw_kd.nband))
        clouds_band = OpticalProps2str(
            ctau_band, jnp.full_like(ctau_band, 0.4), jnp.full_like(ctau_band, 0.85), band_sm
        )

        def solve(cloud_props):
            atmos = increment(props, cloud_props) if cloud_props is not None else props
            sol = rte_lw(atmos, True, sources, emis, broadband=True)
            return sol.flux_up

        up_clear = solve(None)
        overcast = OpticalProps2str(
            jnp.where((cf > 0)[:, :, None], 4.0, 0.0) * jnp.ones((1, 1, lw_kd.nband)),
            clouds_band.ssa, clouds_band.g, band_sm,
        )
        up_over = solve(overcast)
        expected = 0.5 * up_clear + 0.5 * up_over  # max overlap, single deck

        # McICA: average over several independent sample draws
        ups = []
        for seed in range(6):
            rnd = jax.random.uniform(jax.random.PRNGKey(seed), (ncol, nlay, lw_kd.ngpt))
            mask = sampled_mask_max_ran(rnd, cf)
            sampled = draw_samples_to(lw_kd.spectral, mask, clouds_band)
            ups.append(np.asarray(solve(sampled)))
        mcica = np.mean(ups, axis=0)
        # noise ~ 1/sqrt(ngpt*nseeds); tolerance a few W/m2 relative to the
        # clear-overcast contrast
        contrast = float(jnp.abs(up_clear - up_over).max())
        assert np.max(np.abs(mcica - np.asarray(expected))) < 0.15 * contrast + 0.5
