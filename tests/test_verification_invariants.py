"""End-to-end physics-invariant suite.

Reference parity: ``tests/clear_sky_regression.F90`` + ``tests/
verification.py:26-77`` -- the same invariants checked on our stack with a
synthetic k-distribution: vertically-flipped inputs give flipped fluxes,
column subsets match the full run, the surface-temperature Jacobian matches
a finite difference, net computed two ways agrees, incrementing with
zero-valued optical props is the identity, and TSI scaling is linear.
Thresholds follow the reference (report 1e-10, fail 1e-5 relative).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.fluxes import net_broadband_full, reduce_broadband
from rte_rrtmgp_nn_tpu.gas_concs import GasConcs
from rte_rrtmgp_nn_tpu.gasoptics.kdist import load_kdist
from rte_rrtmgp_nn_tpu.gasoptics.lut_gas_optics import gas_optics_lw_lut, gas_optics_sw_lut
from rte_rrtmgp_nn_tpu.gasoptics.synthetic import generate_kdist_nc
from rte_rrtmgp_nn_tpu.optical_props import increment, subset, zeros_1scl, zeros_2str
from rte_rrtmgp_nn_tpu.rte import rte_lw, rte_sw

from test_lut_gas_optics import GASES, make_atmosphere

FAIL_TOL = 1e-5


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


@pytest.fixture(scope="module")
def atmos():
    return make_atmosphere(ncol=6, nlay=24)


def run_lw(kd, atmos, flip=False, dTs=0.0, compute_jac=False, n_angles=1):
    play, plev, tlay, tlev, tsfc, gc = atmos
    if flip:
        play, plev = jnp.flip(play, 1), jnp.flip(plev, 1)
        tlay, tlev = jnp.flip(tlay, 1), jnp.flip(tlev, 1)
        gc = GasConcs({k: (jnp.flip(v, -1) if v.ndim else v) for k, v in gc.concs.items()})
    props, sources = gas_optics_lw_lut(
        kd, play, plev, tlay, tsfc + dTs, gc, tlev=tlev, top_at_1=not flip
    )
    emis = jnp.full((play.shape[0], kd.nband), 0.97, play.dtype)
    return rte_lw(props, not flip, sources, emis, compute_jac=compute_jac, n_gauss_angles=n_angles)


class TestLWInvariants:
    def test_vertical_reverse(self, lw_kd, atmos):
        s1 = run_lw(lw_kd, atmos)
        s2 = run_lw(lw_kd, atmos, flip=True)
        up1 = np.asarray(jnp.sum(s1.flux_up, -1))
        up2 = np.asarray(jnp.flip(jnp.sum(s2.flux_up, -1), 1))
        np.testing.assert_allclose(up1, up2, rtol=FAIL_TOL)
        dn1 = np.asarray(jnp.sum(s1.flux_dn, -1))
        dn2 = np.asarray(jnp.flip(jnp.sum(s2.flux_dn, -1), 1))
        np.testing.assert_allclose(dn1, dn2, rtol=FAIL_TOL)

    def test_column_subset(self, lw_kd, atmos):
        """Fluxes for a column subset equal the subset of the full run
        (verification.py subset check)."""
        play, plev, tlay, tlev, tsfc, gc = atmos
        full = run_lw(lw_kd, atmos)
        sub_atmos = (play[2:5], plev[2:5], tlay[2:5], tlev[2:5], tsfc[2:5], gc.subset(2, 3))
        sub = run_lw(lw_kd, sub_atmos)
        np.testing.assert_allclose(
            np.asarray(sub.flux_up), np.asarray(full.flux_up[2:5]), rtol=FAIL_TOL
        )

    def test_jacobian_finite_difference(self, lw_kd, atmos):
        """flux(Ts + 1K) == flux + dF/dTs (verification.py:54-56). The
        Jacobian is defined as the response to a 1 K surface perturbation
        with sources interpolated the same way, so the agreement is to the
        Planck-table linearization (~1e-3 relative)."""
        base = run_lw(lw_kd, atmos, compute_jac=True)
        pert = run_lw(lw_kd, atmos, dTs=1.0)
        up0 = np.asarray(jnp.sum(base.flux_up, -1))
        up1 = np.asarray(jnp.sum(pert.flux_up, -1))
        jac = np.asarray(jnp.sum(base.flux_up_jac, -1))
        np.testing.assert_allclose(up1, up0 + jac, rtol=2e-3)
        # the down Jacobian is exposed and exactly zero (downwelling can't
        # see the surface in the no-scat solver; mo_rte_lw.F90:85 accepts
        # the output but never writes it)
        assert base.flux_dn_jac is not None
        assert not np.any(np.asarray(base.flux_dn_jac))
        dn0 = np.asarray(jnp.sum(base.flux_dn, -1))
        dn1 = np.asarray(jnp.sum(pert.flux_dn, -1))
        np.testing.assert_allclose(dn1, dn0, rtol=1e-12)

    def test_net_two_ways(self, lw_kd, atmos):
        sol = run_lw(lw_kd, atmos)
        fb = reduce_broadband(sol.flux_up, sol.flux_dn)
        net_direct = np.asarray(net_broadband_full(sol.flux_dn, sol.flux_up))
        np.testing.assert_allclose(np.asarray(fb.flux_net), net_direct, rtol=1e-5, atol=1e-4)

    def test_increment_zero_identity_end_to_end(self, lw_kd, atmos):
        """Adding zero-valued 1scl and band-resolved 2str props leaves
        fluxes unchanged (verification.py:64-74)."""
        play, plev, tlay, tlev, tsfc, gc = atmos
        props, sources = gas_optics_lw_lut(lw_kd, play, plev, tlay, tsfc, gc, tlev=tlev)
        emis = jnp.full((play.shape[0], lw_kd.nband), 0.97, play.dtype)
        base = rte_lw(props, True, sources, emis)
        from rte_rrtmgp_nn_tpu.spectral import SpectralMapping

        band_sm = SpectralMapping.bands_only(lw_kd.spectral.band_lims_wvn_array)
        ncol, nlay = play.shape
        for zero in (
            zeros_1scl(ncol, nlay, lw_kd.spectral, play.dtype),
            zeros_1scl(ncol, nlay, band_sm, play.dtype),
            zeros_2str(ncol, nlay, band_sm, play.dtype),
        ):
            inc = increment(props, zero)
            sol = rte_lw(inc, True, sources, emis)
            np.testing.assert_allclose(
                np.asarray(sol.flux_up), np.asarray(base.flux_up), rtol=FAIL_TOL
            )

    def test_multi_angle_runs(self, lw_kd, atmos):
        s3 = run_lw(lw_kd, atmos, n_angles=3)
        assert np.all(np.isfinite(np.asarray(s3.flux_up)))


class TestSWInvariants:
    def test_tsi_scaling(self, sw_kd, atmos):
        """Doubling the TSI doubles all SW fluxes (verification.py tsi
        check)."""
        play, plev, tlay, tlev, tsfc, gc = atmos
        ncol = play.shape[0]
        mu0 = jnp.full((ncol,), 0.7, play.dtype)
        alb = jnp.full((ncol, sw_kd.ngpt), 0.15, play.dtype)
        props, src1 = gas_optics_sw_lut(sw_kd, play, plev, tlay, gc, tsi=1360.0)
        _, src2 = gas_optics_sw_lut(sw_kd, play, plev, tlay, gc, tsi=2720.0)
        s1 = rte_sw(props, True, mu0, src1.toa_source, alb, alb)
        s2 = rte_sw(props, True, mu0, src2.toa_source, alb, alb)
        np.testing.assert_allclose(
            np.asarray(s2.flux_dn), 2.0 * np.asarray(s1.flux_dn), rtol=FAIL_TOL
        )
        np.testing.assert_allclose(
            np.asarray(s2.flux_up), 2.0 * np.asarray(s1.flux_up), rtol=FAIL_TOL
        )

    def test_vertical_reverse_sw(self, sw_kd, atmos):
        play, plev, tlay, tlev, tsfc, gc = atmos
        ncol = play.shape[0]
        mu0 = jnp.full((ncol,), 0.6, play.dtype)
        alb = jnp.full((ncol, sw_kd.ngpt), 0.1, play.dtype)
        props, src = gas_optics_sw_lut(sw_kd, play, plev, tlay, gc)
        s1 = rte_sw(props, True, mu0, src.toa_source, alb, alb)
        gc_f = GasConcs({k: (jnp.flip(v, -1) if v.ndim else v) for k, v in gc.concs.items()})
        props_f, src_f = gas_optics_sw_lut(
            sw_kd, jnp.flip(play, 1), jnp.flip(plev, 1), jnp.flip(tlay, 1), gc_f
        )
        s2 = rte_sw(props_f, False, mu0, src_f.toa_source, alb, alb)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(s1.flux_dn, -1)),
            np.asarray(jnp.flip(jnp.sum(s2.flux_dn, -1), 1)),
            rtol=FAIL_TOL,
        )
