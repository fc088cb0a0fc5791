"""Core data-model tests: spectral mapping, optical-props algebra, gas concs.

Mirrors the reference test strategy (SURVEY.md section 4): physics
self-consistency rather than golden files -- e.g. the increment-with-zero
identity checked by tests/verification.py:64-74.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu import (
    GasConcs,
    OpticalProps1scl,
    OpticalProps2str,
    SpectralMapping,
    delta_scale,
    get_ref_vmr,
    increment,
    subset,
    validate,
    zeros_2str,
)


def make_spectral(nband=4, gpts_per_band=8):
    blg = np.stack(
        [np.arange(nband) * gpts_per_band, (np.arange(nband) + 1) * gpts_per_band], axis=1
    )
    blw = np.stack([np.arange(nband) * 100.0, (np.arange(nband) + 1) * 100.0], axis=1)
    return SpectralMapping.create(blg, blw)


def random_2str(rng, ncol=3, nlay=5, spectral=None):
    spectral = spectral or make_spectral()
    shape = (ncol, nlay, spectral.ngpt)
    tau = jnp.asarray(rng.uniform(0.01, 2.0, shape), jnp.float32)
    ssa = jnp.asarray(rng.uniform(0.1, 0.9, shape), jnp.float32)
    g = jnp.asarray(rng.uniform(-0.4, 0.8, shape), jnp.float32)
    return OpticalProps2str(tau, ssa, g, spectral)


class TestSpectralMapping:
    def test_expand_and_reduce(self):
        sm = make_spectral(nband=3, gpts_per_band=4)
        band_vals = jnp.arange(3, dtype=jnp.float32)[None, :]  # (1, 3)
        gpt = sm.expand(band_vals)
        assert gpt.shape == (1, 12)
        assert np.allclose(np.asarray(gpt[0, :4]), 0.0)
        assert np.allclose(np.asarray(gpt[0, 8:]), 2.0)
        back = sm.reduce_sum(gpt)
        assert np.allclose(np.asarray(back[0]), [0.0, 4.0, 8.0])

    def test_gpt2band(self):
        sm = make_spectral(nband=2, gpts_per_band=3)
        assert sm.ngpt == 6 and sm.nband == 2
        assert list(sm.gpt2band) == [0, 0, 0, 1, 1, 1]

    def test_fortran_limits(self):
        sm = SpectralMapping.from_fortran_limits(
            np.array([[1, 4], [5, 8]]), np.array([[10.0, 20.0], [20.0, 30.0]])
        )
        assert sm.band_lims_gpt == ((0, 4), (4, 8))

    def test_hashable_static(self):
        sm1, sm2 = make_spectral(), make_spectral()
        assert hash(sm1) == hash(sm2) and sm1 == sm2


class TestOpticalProps:
    def test_pytree_roundtrip(self, rng):
        op = random_2str(rng)
        leaves, treedef = jax.tree_util.tree_flatten(op)
        assert len(leaves) == 3
        op2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert op2.spectral is op.spectral

    def test_increment_zero_identity(self, rng):
        """Incrementing with zero-valued props is the identity
        (reference tests/verification.py:64-74)."""
        op = random_2str(rng)
        zero = zeros_2str(op.ncol, op.nlay, op.spectral)
        out = increment(op, zero)
        np.testing.assert_allclose(np.asarray(out.tau), np.asarray(op.tau), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.ssa), np.asarray(op.ssa), rtol=1e-5)

    def test_increment_1scl_into_2str(self, rng):
        op = random_2str(rng)
        other = OpticalProps1scl(jnp.ones_like(op.tau) * 0.5, op.spectral)
        out = increment(op, other)
        np.testing.assert_allclose(np.asarray(out.tau), np.asarray(op.tau) + 0.5, rtol=1e-6)
        # scattering optical depth unchanged -> ssa decreases
        assert np.all(np.asarray(out.ssa) < np.asarray(op.ssa) + 1e-7)
        # g is UNCHANGED bit-for-bit (reference
        # increment_2stream_by_1scalar:169-189 "g is unchanged") --
        # including where ssa == 0 and a tauscat recombination would
        # zero it
        op0 = dataclasses.replace(op, ssa=op.ssa.at[:, :2].set(0.0))
        out0 = increment(op0, other)
        np.testing.assert_array_equal(np.asarray(out0.g), np.asarray(op0.g))

    def test_increment_byband_broadcast(self, rng):
        """Band-resolved props broadcast to g-points (inc_*_bybnd kernels)."""
        op = random_2str(rng)
        sm_band = SpectralMapping.bands_only(op.spectral.band_lims_wvn_array)
        band_tau = jnp.asarray(
            rng.uniform(0.1, 1.0, (op.ncol, op.nlay, op.spectral.nband)), jnp.float32
        )
        other = OpticalProps1scl(band_tau, sm_band)
        out = increment(op, other)
        expected = np.asarray(op.tau) + np.asarray(op.spectral.expand(band_tau))
        np.testing.assert_allclose(np.asarray(out.tau), expected, rtol=1e-6)

    def test_delta_scale_conserves_extinction_meaning(self, rng):
        op = random_2str(rng)
        ds = delta_scale(op)
        # delta scaling reduces tau and g, preserves tau*(1-ssa*f) relation
        f = np.asarray(op.g) ** 2
        np.testing.assert_allclose(
            np.asarray(ds.tau), np.asarray(op.tau) * (1 - np.asarray(op.ssa) * f), rtol=1e-6
        )
        assert np.all(np.asarray(ds.g) <= np.asarray(op.g) + 1e-7)

    def test_subset(self, rng):
        op = random_2str(rng, ncol=6)
        sub = subset(op, 2, 3)
        assert sub.ncol == 3
        np.testing.assert_array_equal(np.asarray(sub.tau), np.asarray(op.tau[2:5]))

    def test_validate(self, rng):
        op = random_2str(rng)
        assert validate(op) == []
        bad = dataclasses.replace(op, ssa=op.ssa + 2.0)
        assert any("ssa" in e for e in validate(bad))


class TestGasConcs:
    def test_broadcasting(self):
        gc = GasConcs.create(
            {"co2": 4e-4, "o3": np.linspace(1e-8, 1e-6, 5), "h2o": np.ones((3, 5)) * 1e-3}
        )
        for name in ("co2", "o3", "h2o"):
            assert gc.get_vmr(name, 3, 5).shape == (3, 5)
        assert np.allclose(np.asarray(gc.get_vmr("co2", 3, 5)), 4e-4)

    def test_name_normalization(self):
        gc = GasConcs.create({"Carbon_Dioxide": 4e-4})
        assert "co2" in gc
        assert gc.get_vmr("CO2", 2, 2).shape == (2, 2)

    def test_set_vmr_validation(self):
        gc = GasConcs.create({"co2": 4e-4})
        with pytest.raises(ValueError):
            gc.set_vmr("ch4", 1.5)

    def test_subset(self):
        gc = GasConcs.create({"h2o": np.ones((4, 5)), "co2": 4e-4})
        # note: ones <= 1 allowed
        sub = gc.subset(1, 2)
        assert sub.get_raw("h2o").shape == (2, 5)
        assert sub.get_raw("co2").shape == ()

    def test_ref_vmr_scenarios(self):
        assert get_ref_vmr(1, "co2") == pytest.approx(397.547e-6)
        assert get_ref_vmr(2, "cfc11") == 0.0
        assert get_ref_vmr(3, "ch4") == pytest.approx(2478.709e-9)
        assert get_ref_vmr(1, "not_a_gas") == 0.0


class TestRteDispatchGuards:
    """Argument-consistency + check_values wiring in rte_lw/rte_sw
    (reference mo_rte_lw.F90:190-266, mo_rte_sw.F90:120-133)."""

    def _lw_setup(self, rng):
        from rte_rrtmgp_nn_tpu.sources import SourceFuncLW

        sm = make_spectral()
        ncol, nlay, ngpt = 2, 4, sm.ngpt
        u = lambda *s: jnp.asarray(rng.uniform(0.1, 1.0, s), jnp.float32)
        props1 = OpticalProps1scl(u(ncol, nlay, ngpt), sm)
        props2 = random_2str(rng, ncol=ncol, nlay=nlay, spectral=sm)
        src = SourceFuncLW(
            lay_source=u(ncol, nlay, ngpt),
            lev_source=u(ncol, nlay + 1, ngpt),
            sfc_source=u(ncol, ngpt),
            sfc_source_jac=u(ncol, ngpt),
            spectral=sm,
        )
        emis = jnp.full((ncol, sm.nband), 0.98, jnp.float32)
        return props1, props2, src, emis

    def test_lw_ds_rejected_on_2str(self, rng):
        from rte_rrtmgp_nn_tpu.rte import rte_lw

        props1, props2, src, emis = self._lw_setup(rng)
        ds = jnp.full(props1.tau.shape[::2], 1.66, jnp.float32)
        with pytest.raises(ValueError, match="lw_ds"):
            rte_lw(props2, True, src, emis, lw_ds=ds)
        with pytest.raises(ValueError, match="n_gauss_angles"):
            rte_lw(props1, True, src, emis, lw_ds=ds, n_gauss_angles=2)

    def test_2stream_rejects_1scl_and_jacobian(self, rng):
        from rte_rrtmgp_nn_tpu.rte import rte_lw

        props1, props2, src, emis = self._lw_setup(rng)
        with pytest.raises(ValueError, match="two-stream"):
            rte_lw(props1, True, src, emis, use_2stream=True)
        with pytest.raises(ValueError, match="Jacobian"):
            rte_lw(props2, True, src, emis, use_2stream=True, compute_jac=True)

    def test_check_values_catches_bad_inputs(self, rng):
        from rte_rrtmgp_nn_tpu.config import config_override
        from rte_rrtmgp_nn_tpu.rte import rte_lw, rte_sw

        props1, props2, src, emis = self._lw_setup(rng)
        ncol, _, ngpt = props1.tau.shape
        with config_override(check_values=True):
            # valid inputs pass
            rte_lw(props1, True, src, emis)
            with pytest.raises(ValueError, match="sfc_emis"):
                rte_lw(props1, True, src, emis + 2.0)
            bad = dataclasses.replace(props2, ssa=props2.ssa + 2.0)
            with pytest.raises(ValueError, match="ssa"):
                rte_lw(bad, True, src, emis, use_2stream=True)
            mu0 = jnp.full((ncol,), 0.8, jnp.float32)
            inc = jnp.ones((ncol, ngpt), jnp.float32)
            alb = jnp.zeros((ncol, ngpt), jnp.float32)
            rte_sw(props2, True, mu0, inc, alb, alb)
            with pytest.raises(ValueError, match="mu0"):
                rte_sw(props2, True, mu0 - 1.0, inc, alb, alb)
            with pytest.raises(ValueError, match="inc_flux"):
                rte_sw(props2, True, mu0, inc - 2.0, alb, alb)

    def test_sw_broadband_rank_consistent_across_prop_types(self, rng):
        from rte_rrtmgp_nn_tpu.rte import rte_sw

        props1, props2, _, _ = self._lw_setup(rng)
        ncol, nlay, ngpt = props1.tau.shape
        mu0 = jnp.full((ncol,), 0.8, jnp.float32)
        inc = jnp.ones((ncol, ngpt), jnp.float32)
        alb = jnp.zeros((ncol, ngpt), jnp.float32)
        s1 = rte_sw(props1, True, mu0, inc, alb, alb, broadband=True)
        s2 = rte_sw(props2, True, mu0, inc, alb, alb, broadband=True)
        assert s1.flux_dn.shape == (ncol, nlay + 1)
        assert s1.flux_dn.shape == s2.flux_dn.shape

    def test_create_validates_range(self):
        with pytest.raises(ValueError, match="outside"):
            GasConcs.create({"h2o": 1.5})
