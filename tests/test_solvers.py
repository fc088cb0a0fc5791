"""LW/SW solver tests: analytic limits and physics invariants.

Validation strategy (no golden flux files are shipped with the reference;
its own CI checks physics invariants in tests/verification.py):
  - analytic limits: isothermal no-scat LW column -> blackbody flux;
    transparent column conserves fluxes; SW direct beam = Beer-Lambert.
  - invariants: vertical flip gives flipped fluxes (verification.py vr
    check), sequential == parallel (associative) scans, Jacobian finite
    difference, energy conservation in conservative scattering.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.ops.adding import adding
from rte_rrtmgp_nn_tpu.ops.lw_solver import (
    lw_solver_2stream,
    lw_solver_noscat,
)
from rte_rrtmgp_nn_tpu.ops.scan import affine_scan, affine_scan_reverse
from rte_rrtmgp_nn_tpu.ops.sw_solver import sw_solver_2stream, sw_solver_noscat

SIGMA = 5.670374419e-8


def _setup_lw(rng, ncol=4, nlay=10, ngpt=16, isothermal=None, dtype=jnp.float64):
    """Random LW problem. If isothermal is a temperature, all sources are the
    (spectrally uniform) blackbody value B = sigma T^4 / (pi-free flux units
    split uniformly over ngpt)."""
    shape = (ncol, nlay, ngpt)
    tau = jnp.asarray(rng.uniform(0.05, 1.5, shape), dtype)
    if isothermal is not None:
        b = SIGMA * isothermal**4 / np.pi / ngpt  # radiance units per gpt
        lay = jnp.full(shape, b, dtype)
        lev = jnp.full((ncol, nlay + 1, ngpt), b, dtype)
        sfc = jnp.full((ncol, ngpt), b, dtype)
    else:
        lay = jnp.asarray(rng.uniform(0.5, 1.0, shape), dtype)
        lev = jnp.asarray(rng.uniform(0.5, 1.0, (ncol, nlay + 1, ngpt)), dtype)
        sfc = jnp.asarray(rng.uniform(0.5, 1.0, (ncol, ngpt)), dtype)
    emis = jnp.ones((ncol, ngpt), dtype)
    return tau, lay, lev, emis, sfc


class TestScans:
    def test_affine_scan_matches_loop(self, rng):
        t = jnp.asarray(rng.uniform(0.1, 0.9, (2, 7, 3)))
        s = jnp.asarray(rng.uniform(0, 1, (2, 7, 3)))
        r0 = jnp.asarray(rng.uniform(0, 1, (2, 3)))
        out = affine_scan(t, s, r0, axis=1)
        ref = [np.asarray(r0)]
        for k in range(7):
            ref.append(np.asarray(t[:, k]) * ref[-1] + np.asarray(s[:, k]))
        np.testing.assert_allclose(np.asarray(out), np.stack(ref, axis=1), rtol=1e-6)

    def test_parallel_equals_sequential(self, rng):
        t = jnp.asarray(rng.uniform(0.1, 0.9, (2, 13, 5)))
        s = jnp.asarray(rng.uniform(0, 1, (2, 13, 5)))
        r0 = jnp.asarray(rng.uniform(0, 1, (2, 5)))
        a = affine_scan(t, s, r0, axis=1, mode="sequential")
        b = affine_scan(t, s, r0, axis=1, mode="parallel")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
        c = affine_scan_reverse(t, s, r0, axis=1, mode="sequential")
        d = affine_scan_reverse(t, s, r0, axis=1, mode="parallel")
        np.testing.assert_allclose(np.asarray(c), np.asarray(d), rtol=1e-5)


class TestLWNoScat:
    def test_isothermal_blackbody(self, rng):
        """Optically thick isothermal column with black surface: upward flux
        == sigma T^4 everywhere, downward -> sigma T^4 deep inside."""
        T = 288.0
        tau, lay, lev, emis, sfc = _setup_lw(rng, isothermal=T)
        tau = tau * 50.0  # optically thick
        # Sources are radiance-like (B = sigma T^4 / pi); the solver's
        # 2*pi*weight factor (weight=0.5) converts to flux units.
        sol = lw_solver_noscat(tau, lay, lev, emis, sfc, n_gauss_angles=1)
        bb = SIGMA * T**4
        up = np.asarray(jnp.sum(sol.flux_up, -1))
        dn = np.asarray(jnp.sum(sol.flux_dn, -1))
        np.testing.assert_allclose(up, bb, rtol=2e-3)
        np.testing.assert_allclose(dn[:, -1], bb, rtol=2e-3)  # at surface
        assert np.allclose(dn[:, 0], 0.0)  # TOA downward = 0

    def test_transparent_column(self, rng):
        """tau -> 0: down flux equals incident BC at every level, up flux
        equals the surface emission."""
        ncol, nlay, ngpt = 3, 8, 4
        tau = jnp.full((ncol, nlay, ngpt), 1e-9)
        zero = jnp.zeros((ncol, nlay, ngpt))
        lev = jnp.zeros((ncol, nlay + 1, ngpt))
        emis = jnp.ones((ncol, ngpt))
        sfc = jnp.full((ncol, ngpt), 7.0)
        inc = jnp.full((ncol, ngpt), 2.5)
        sol = lw_solver_noscat(tau, zero, lev, emis, sfc, inc_flux=inc)
        # inc_flux is a flux BC (divided by 2*pi*w then restored); the
        # surface source is radiance, flux = pi * radiance.
        np.testing.assert_allclose(np.asarray(sol.flux_dn), 2.5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sol.flux_up), 7.0 * np.pi, rtol=1e-5)

    def test_vertical_flip_invariance(self, rng):
        """Flipping the layer order and top_at_1 gives flipped fluxes
        (reference verification.py 'vr' check)."""
        tau, lay, lev, emis, sfc = _setup_lw(rng)
        sol1 = lw_solver_noscat(tau, lay, lev, emis, sfc, top_at_1=True)
        sol2 = lw_solver_noscat(
            jnp.flip(tau, 1), jnp.flip(lay, 1), jnp.flip(lev, 1), emis, sfc, top_at_1=False
        )
        np.testing.assert_allclose(
            np.asarray(sol1.flux_up), np.asarray(jnp.flip(sol2.flux_up, 1)), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sol1.flux_dn), np.asarray(jnp.flip(sol2.flux_dn, 1)), rtol=1e-6
        )

    def test_multi_angle_close_to_diffusivity(self, rng):
        """3-angle quadrature should be within a few percent of the
        1.66-diffusivity result for moderately thick atmospheres."""
        tau, lay, lev, emis, sfc = _setup_lw(rng)
        s1 = lw_solver_noscat(tau, lay, lev, emis, sfc, n_gauss_angles=1)
        s3 = lw_solver_noscat(tau, lay, lev, emis, sfc, n_gauss_angles=3)
        up1 = np.asarray(jnp.sum(s1.flux_up, -1))
        up3 = np.asarray(jnp.sum(s3.flux_up, -1))
        assert np.max(np.abs(up1 - up3) / np.abs(up3)) < 0.05

    def test_jacobian_pure_transmission(self, rng):
        """The surface-Jacobian propagates with transmission only: at the
        surface it equals emis*jac, at TOA emis*jac*prod(trans)."""
        tau, lay, lev, emis, sfc = _setup_lw(rng)
        jac = jnp.ones_like(sfc) * 0.4
        sol = lw_solver_noscat(tau, lay, lev, emis, sfc, sfc_source_jac=jac)
        assert sol.flux_up_jac is not None
        jac_sfc = np.asarray(sol.flux_up_jac[:, -1, :])
        np.testing.assert_allclose(jac_sfc, 2 * np.pi * 0.5 * 0.4, rtol=1e-6)
        trans_prod = np.exp(-1.66 * np.asarray(jnp.sum(tau, axis=1)))
        np.testing.assert_allclose(
            np.asarray(sol.flux_up_jac[:, 0, :]), 2 * np.pi * 0.5 * 0.4 * trans_prod, rtol=1e-5
        )

    def test_scan_modes_agree(self, rng):
        tau, lay, lev, emis, sfc = _setup_lw(rng)
        s1 = lw_solver_noscat(tau, lay, lev, emis, sfc, scan_mode="sequential")
        s2 = lw_solver_noscat(tau, lay, lev, emis, sfc, scan_mode="parallel")
        np.testing.assert_allclose(np.asarray(s1.flux_up), np.asarray(s2.flux_up), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.flux_dn), np.asarray(s2.flux_dn), rtol=1e-6)

    def test_rescaling_reduces_to_noscat_when_ssa_zero(self, rng):
        tau, lay, lev, emis, sfc = _setup_lw(rng)
        ssa = jnp.zeros_like(tau)
        g = jnp.zeros_like(tau)
        s0 = lw_solver_noscat(tau, lay, lev, emis, sfc)
        s1 = lw_solver_noscat(tau, lay, lev, emis, sfc, ssa=ssa, g=g, do_rescaling=True)
        np.testing.assert_allclose(np.asarray(s0.flux_up), np.asarray(s1.flux_up), rtol=1e-6)


class TestAdding:
    def test_modes_agree(self, rng):
        ncol, nlay, ngpt = 3, 11, 6
        r = jnp.asarray(rng.uniform(0.05, 0.4, (ncol, nlay, ngpt)))
        t = jnp.asarray(rng.uniform(0.3, 0.55, (ncol, nlay, ngpt)))
        sd = jnp.asarray(rng.uniform(0, 1, (ncol, nlay, ngpt)))
        su = jnp.asarray(rng.uniform(0, 1, (ncol, nlay, ngpt)))
        alb = jnp.asarray(rng.uniform(0, 0.8, (ncol, ngpt)))
        ssfc = jnp.asarray(rng.uniform(0, 1, (ncol, ngpt)))
        ftop = jnp.asarray(rng.uniform(0, 1, (ncol, ngpt)))
        u1, d1 = adding(alb, r, t, sd, su, ssfc, ftop, mode="sequential")
        u2, d2 = adding(alb, r, t, sd, su, ssfc, ftop, mode="parallel")
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)

    def test_vacuum_layers(self, rng):
        """r=0, t=1, no sources: fluxes just pass through."""
        ncol, nlay, ngpt = 2, 5, 3
        z = jnp.zeros((ncol, nlay, ngpt))
        o = jnp.ones((ncol, nlay, ngpt))
        alb = jnp.zeros((ncol, ngpt))
        ssfc = jnp.zeros((ncol, ngpt))
        ftop = jnp.full((ncol, ngpt), 3.0)
        up, dn = adding(alb, z, o, z, z, ssfc, ftop)
        np.testing.assert_allclose(np.asarray(dn), 3.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(up), 0.0, atol=1e-6)


class TestSW:
    def test_direct_beam_beer_lambert(self, rng):
        ncol, nlay, ngpt = 2, 6, 4
        tau = jnp.asarray(rng.uniform(0.01, 0.5, (ncol, nlay, ngpt)))
        mu0 = jnp.asarray(rng.uniform(0.3, 1.0, (ncol,)))
        inc = jnp.ones((ncol, ngpt)) * 1360.0 / ngpt
        flux = sw_solver_noscat(tau, mu0, inc)
        expected_sfc = (
            np.asarray(inc)
            * np.asarray(mu0)[:, None]
            * np.exp(-np.asarray(jnp.sum(tau, 1)) / np.asarray(mu0)[:, None])
        )
        np.testing.assert_allclose(np.asarray(flux[:, -1, :]), expected_sfc, rtol=1e-5)

    def test_energy_conservation_conservative_scattering(self, rng):
        """ssa=1 (no absorption), black surface: at TOA, up + (dn at sfc
        absorbed) must equal incident; with sfc_alb=0: up_toa + dn_sfc = inc*mu0."""
        ncol, nlay, ngpt = 3, 20, 8
        tau = jnp.asarray(rng.uniform(0.05, 0.5, (ncol, nlay, ngpt)), jnp.float64)
        ssa = jnp.ones_like(tau) * (1.0 - 1e-9)
        g = jnp.asarray(rng.uniform(0.0, 0.8, tau.shape), jnp.float64)
        mu0 = jnp.asarray(rng.uniform(0.4, 1.0, (ncol,)), jnp.float64)
        inc = jnp.ones((ncol, ngpt), jnp.float64) * 100.0
        alb0 = jnp.zeros((ncol, ngpt), jnp.float64)
        sol = sw_solver_2stream(tau, ssa, g, mu0, inc, alb0, alb0)
        incident = np.asarray(inc) * np.asarray(mu0)[:, None]
        up_toa = np.asarray(sol.flux_up[:, 0, :])
        dn_sfc = np.asarray(sol.flux_dn[:, -1, :])
        np.testing.assert_allclose(up_toa + dn_sfc, incident, rtol=2e-4)

    def test_no_scattering_limit_matches_direct(self, rng):
        """ssa -> 0: total dn equals direct beam, up = albedo-reflected
        surface term only."""
        ncol, nlay, ngpt = 2, 8, 4
        tau = jnp.asarray(rng.uniform(0.05, 0.5, (ncol, nlay, ngpt)), jnp.float64)
        ssa = jnp.zeros_like(tau)
        g = jnp.zeros_like(tau)
        mu0 = jnp.asarray(rng.uniform(0.4, 1.0, (ncol,)), jnp.float64)
        inc = jnp.ones((ncol, ngpt), jnp.float64) * 500.0
        alb0 = jnp.zeros((ncol, ngpt), jnp.float64)
        sol = sw_solver_2stream(tau, ssa, g, mu0, inc, alb0, alb0)
        np.testing.assert_allclose(
            np.asarray(sol.flux_dn), np.asarray(sol.flux_dn_dir), rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(sol.flux_up), 0.0, atol=1e-8)

    def test_vertical_flip_invariance(self, rng):
        ncol, nlay, ngpt = 2, 7, 4
        tau = jnp.asarray(rng.uniform(0.05, 0.5, (ncol, nlay, ngpt)))
        ssa = jnp.asarray(rng.uniform(0.2, 0.9, tau.shape))
        g = jnp.asarray(rng.uniform(0.0, 0.7, tau.shape))
        mu0 = jnp.asarray(rng.uniform(0.4, 1.0, (ncol,)))
        inc = jnp.ones((ncol, ngpt)) * 300.0
        alb_dir = jnp.full((ncol, ngpt), 0.2)
        alb_dif = jnp.full((ncol, ngpt), 0.3)
        s1 = sw_solver_2stream(tau, ssa, g, mu0, inc, alb_dir, alb_dif, top_at_1=True)
        s2 = sw_solver_2stream(
            jnp.flip(tau, 1), jnp.flip(ssa, 1), jnp.flip(g, 1), mu0, inc, alb_dir, alb_dif,
            top_at_1=False,
        )
        np.testing.assert_allclose(
            np.asarray(s1.flux_up), np.asarray(jnp.flip(s2.flux_up, 1)), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s1.flux_dn), np.asarray(jnp.flip(s2.flux_dn, 1)), rtol=1e-5
        )

    def test_scan_modes_agree(self, rng):
        ncol, nlay, ngpt = 2, 9, 4
        tau = jnp.asarray(rng.uniform(0.05, 0.5, (ncol, nlay, ngpt)))
        ssa = jnp.asarray(rng.uniform(0.2, 0.9, tau.shape))
        g = jnp.asarray(rng.uniform(0.0, 0.7, tau.shape))
        mu0 = jnp.asarray(rng.uniform(0.4, 1.0, (ncol,)))
        inc = jnp.ones((ncol, ngpt)) * 300.0
        alb = jnp.full((ncol, ngpt), 0.25)
        s1 = sw_solver_2stream(tau, ssa, g, mu0, inc, alb, alb, scan_mode="sequential")
        s2 = sw_solver_2stream(tau, ssa, g, mu0, inc, alb, alb, scan_mode="parallel")
        np.testing.assert_allclose(np.asarray(s1.flux_up), np.asarray(s2.flux_up), rtol=1e-5)


class TestLW2Stream:
    def test_matches_noscat_when_no_scattering(self, rng):
        """ssa=0 two-stream should be close to the no-scat solver (different
        angular treatment: both use the 1.66 diffusivity)."""
        tau, lay, lev, emis, sfc = _setup_lw(rng, ngpt=8)
        # Both solvers take radiance-like sources: the 2-stream applies the
        # pi factor in lw_source_2str, the no-scat applies 2*pi*weight.
        sol2 = lw_solver_2stream(
            tau, jnp.zeros_like(tau), jnp.zeros_like(tau), lay, lev, emis, sfc
        )
        sol1 = lw_solver_noscat(tau, lay, lev, emis, sfc)
        up1 = np.asarray(jnp.sum(sol1.flux_up, -1))
        up2 = np.asarray(jnp.sum(sol2.flux_up, -1))
        # The source approximations differ (Toon-1989 vs Clough linear-in-tau),
        # so agreement is only to ~10% at moderate tau; this is a sanity
        # check, not a parity check.
        assert np.max(np.abs(up1 - up2) / np.abs(up1)) < 0.15
