"""Megakernel dispatch guard matrix (VERDICT r2 item 5).

Every configuration the fused Pallas megakernels cannot honor must route
the drivers to a staged core -- silently dispatching the mega path for one
of these would change physics on TPU only, where CI never runs. For each
guard we spy on the mega-core entry points in ``drivers.rfmip`` and assert
(a) the mega core is NOT called and (b) the driver output matches the
generic reference path. Reference dispatch semantics: ``mo_rte_lw.F90``
:305-395 (single solver entry branching on configuration).
"""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.config import (
    config_override,
    megakernel_model_ok,
    resolve_use_megakernel,
)
from rte_rrtmgp_nn_tpu.drivers import rfmip as rfmip_mod
from rte_rrtmgp_nn_tpu.drivers.rfmip import (
    rfmip_clear_sky_lw,
    rfmip_clear_sky_sw,
)
from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

D = "/root/reference/neural/data/"
LW_BOTH = D + "lw-g128-210809_both_BEST.nc"
LW_ABS = D + "lw-g128-210809_absorption_BEST.nc"
LW_PFRAC = D + "lw-g128-210809_planck_frac_BEST.nc"
SW_ABS = D + "sw-g112-210809_absorption_BEST.nc"
SW_RAY = D + "sw-g112-210809_rayleigh_BEST.nc"


def _need(*paths):
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("reference NN models not available")


@pytest.fixture(scope="module")
def data(rfmip_file):
    return read_rfmip(rfmip_file).block(0, 16)


def _spy(monkeypatch, name, forbid=False):
    """Replace drivers.rfmip.<name> with a counting wrapper (or a hard
    failure when ``forbid``). Returns the call-count list."""
    calls = []
    orig = getattr(rfmip_mod, name)

    def wrapper(*a, **k):
        calls.append(name)
        if forbid:
            raise AssertionError(f"{name} must not be dispatched here")
        return orig(*a, **k)

    monkeypatch.setattr(rfmip_mod, name, wrapper)
    return calls


def _extend_identity(m):
    """Append an exact identity linear layer: a 4-layer model numerically
    identical to ``m`` through the generic NNModel.apply path, but outside
    the architecture the megakernels hardcode."""
    h = m.weights[-1].shape[1]
    eye = jnp.eye(h, dtype=jnp.float32)
    return dataclasses.replace(
        m,
        weights=(*m.weights, eye),
        biases=(*m.biases, jnp.zeros((h,), jnp.float32)),
        activations=(*m.activations, "linear"),
    )


class TestModelGuard:
    def test_megakernel_model_ok(self):
        _need(LW_BOTH)
        m = load_model_netcdf(LW_BOTH)
        assert megakernel_model_ok([m])
        assert not megakernel_model_ok([_extend_identity(m)])
        relu = dataclasses.replace(
            m, activations=("relu",) + m.activations[1:])
        assert not megakernel_model_ok([relu])
        assert not megakernel_model_ok([m, relu])

    def test_resolve_respects_models(self):
        _need(LW_BOTH)
        m = load_model_netcdf(LW_BOTH)
        with config_override(use_megakernel=True):
            assert resolve_use_megakernel(models=[m])
            assert not resolve_use_megakernel(models=[_extend_identity(m)])
            assert resolve_use_megakernel(lw=True, models=[m])
        with config_override(use_megakernel=True, fast_exponential=True):
            # fast_exponential covers every solver exponential (LW trans,
            # SW direct beam + two-stream), so it forbids BOTH megakernels.
            assert not resolve_use_megakernel(lw=True, models=[m])
            assert not resolve_use_megakernel(lw=False, models=[m])
        with config_override(use_megakernel=True, use_pade_source=True):
            assert not resolve_use_megakernel(lw=True, models=[m])
            # the Pade source is an LW-only form; SW mega stays eligible
            assert resolve_use_megakernel(lw=False, models=[m])


class TestLWGuards:
    """Each guarded configuration must run the staged core, never mega4."""

    def _run_guarded(self, data, monkeypatch, **kwargs):
        mega = _spy(monkeypatch, "_lw_core_mega4_canon", forbid=True)
        _need(LW_BOTH)
        models = kwargs.pop("models", None) or [load_model_netcdf(LW_BOTH)]
        with config_override(use_megakernel=True):
            out = rfmip_clear_sky_lw(data, models, **kwargs)
        assert not mega
        assert np.all(np.isfinite(np.asarray(out.flux_dn)))
        return out

    def test_multi_angle_falls_back(self, data, monkeypatch):
        out = self._run_guarded(data, monkeypatch, n_gauss_angles=3)
        ref = rfmip_clear_sky_lw(data, [load_model_netcdf(LW_BOTH)],
                                 n_gauss_angles=3)
        np.testing.assert_array_equal(np.asarray(out.flux_dn),
                                      np.asarray(ref.flux_dn))

    def test_parallel_scan_falls_back(self, data, monkeypatch):
        self._run_guarded(data, monkeypatch, scan_mode="associative")

    def test_f64_falls_back(self, data, monkeypatch):
        self._run_guarded(data, monkeypatch, dtype=jnp.float64)

    def test_fast_exponential_falls_back(self, data, monkeypatch):
        _need(LW_BOTH)
        mega = _spy(monkeypatch, "_lw_core_mega4_canon", forbid=True)
        models = [load_model_netcdf(LW_BOTH)]
        with config_override(use_megakernel=True, fast_exponential=True):
            out = rfmip_clear_sky_lw(data, models)
        assert not mega
        with config_override(fast_exponential=True):
            ref = rfmip_clear_sky_lw(data, models)
        np.testing.assert_array_equal(np.asarray(out.flux_dn),
                                      np.asarray(ref.flux_dn))

    def test_pade_source_falls_back(self, data, monkeypatch):
        """Driver-level use_pade_source guard (VERDICT r3 item 7): the
        staged core must run (mega4 bakes the linear-in-tau source) and
        match the generic path under the same flag."""
        _need(LW_BOTH)
        mega = _spy(monkeypatch, "_lw_core_mega4_canon", forbid=True)
        models = [load_model_netcdf(LW_BOTH)]
        with config_override(use_megakernel=True, use_pade_source=True):
            out = rfmip_clear_sky_lw(data, models)
        assert not mega
        with config_override(use_pade_source=True):
            ref = rfmip_clear_sky_lw(data, models)
        np.testing.assert_array_equal(np.asarray(out.flux_dn),
                                      np.asarray(ref.flux_dn))
        # and the flag actually changes the physics vs the default source
        base = rfmip_clear_sky_lw(data, models)
        assert not np.array_equal(np.asarray(out.flux_dn),
                                  np.asarray(base.flux_dn))

    def test_two_model_pair_falls_back(self, data, monkeypatch):
        """The absorption + planck_frac two-model fork takes the generic
        core (the mega kernel hardcodes the single 'both' model)."""
        _need(LW_ABS, LW_PFRAC)
        models = [load_model_netcdf(LW_ABS), load_model_netcdf(LW_PFRAC)]
        self._run_guarded(data, monkeypatch, models=models)

    def test_foreign_architecture_falls_back(self, data, monkeypatch):
        _need(LW_BOTH)
        m = load_model_netcdf(LW_BOTH)
        out = self._run_guarded(data, monkeypatch,
                                models=[_extend_identity(m)])
        # the identity-extended model is numerically the same network, so
        # the staged result must match the stock staged run
        ref = rfmip_clear_sky_lw(data, [m])
        np.testing.assert_allclose(np.asarray(out.flux_dn),
                                   np.asarray(ref.flux_dn), atol=1e-4)

    def test_compatible_config_dispatches_mega(self, data, monkeypatch):
        """Positive control: the unguarded configuration DOES take mega4."""
        _need(LW_BOTH)
        mega = _spy(monkeypatch, "_lw_core_mega4_canon")
        m = [load_model_netcdf(LW_BOTH)]
        ref = rfmip_clear_sky_lw(data, m)  # staged (auto off-TPU)
        assert not mega
        with config_override(use_megakernel=True):
            out = rfmip_clear_sky_lw(data, m)
        assert mega == ["_lw_core_mega4_canon"]
        np.testing.assert_allclose(np.asarray(out.flux_dn),
                                   np.asarray(ref.flux_dn), atol=2e-3)


class TestSWGuards:
    def _models(self):
        _need(SW_ABS, SW_RAY)
        return [load_model_netcdf(SW_ABS), load_model_netcdf(SW_RAY)]

    def test_parallel_scan_falls_back(self, data, monkeypatch):
        mega = _spy(monkeypatch, "_sw_core_mega_canon", forbid=True)
        with config_override(use_megakernel=True):
            out = rfmip_clear_sky_sw(data, self._models(),
                                     scan_mode="associative")
        assert not mega
        assert np.all(np.isfinite(np.asarray(out.flux_dn)))

    def test_f64_falls_back(self, data, monkeypatch):
        mega = _spy(monkeypatch, "_sw_core_mega_canon", forbid=True)
        with config_override(use_megakernel=True):
            rfmip_clear_sky_sw(data, self._models(), dtype=jnp.float64)
        assert not mega

    def test_foreign_architecture_falls_back(self, data, monkeypatch):
        mega = _spy(monkeypatch, "_sw_core_mega_canon", forbid=True)
        ma, mr = self._models()
        with config_override(use_megakernel=True):
            out = rfmip_clear_sky_sw(data, [_extend_identity(ma), mr])
        assert not mega
        ref = rfmip_clear_sky_sw(data, [ma, mr])
        np.testing.assert_allclose(np.asarray(out.flux_dn),
                                   np.asarray(ref.flux_dn), atol=1e-4)

    def test_fast_exponential_falls_back(self, data, monkeypatch):
        """fast_exponential now covers the SW direct beam and two-stream
        (reference exp_fast :520-526,1293,1311), which the SW megakernel
        bakes as exact exp -- it must never dispatch under the flag."""
        mega = _spy(monkeypatch, "_sw_core_mega_canon", forbid=True)
        models = self._models()
        with config_override(use_megakernel=True, fast_exponential=True):
            out = rfmip_clear_sky_sw(data, models)
        assert not mega
        with config_override(fast_exponential=True):
            ref = rfmip_clear_sky_sw(data, models)
        np.testing.assert_array_equal(np.asarray(out.flux_dn),
                                      np.asarray(ref.flux_dn))
        # the flag must actually flip the SW staged numerics
        base = rfmip_clear_sky_sw(data, models)
        assert not np.array_equal(np.asarray(out.flux_dn),
                                  np.asarray(base.flux_dn))

    def test_compatible_config_dispatches_mega(self, data, monkeypatch):
        mega = _spy(monkeypatch, "_sw_core_mega_canon")
        models = self._models()
        ref = rfmip_clear_sky_sw(data, models)
        assert not mega
        with config_override(use_megakernel=True):
            out = rfmip_clear_sky_sw(data, models)
        assert mega == ["_sw_core_mega_canon"]
        # the merged block-diagonal two-net GEMM chain groups f32 sums
        # differently from the staged per-net dots (max 0.011 W/m2 on
        # ~1000 W/m2 fluxes); adjudicated vs f64: mega 1.32e-2, staged
        # 1.46e-2 max abs error -- the inter-path delta is f32 noise
        np.testing.assert_allclose(np.asarray(out.flux_dn),
                                   np.asarray(ref.flux_dn), atol=3e-2)


class TestAllskyLWRegime:
    """Regime-aware all-sky LW dispatch (VERDICT r3 item 2): the staged
    lay-major core wins below ALLSKY_LW_MEGA_MIN_NCOL on the chip (3.16 vs
    3.51 ms at the reference's 1800-column workload), so the driver must
    route small batches to it even when the megakernel flag is on."""

    G = "/root/reference/examples/all-sky/garand-atmos-1.nc"
    CLW = ("/root/reference/extensions/cloud_optics/"
           "rrtmgp-cloud-optics-coeffs-lw.nc")

    def _run(self, monkeypatch, ncol, threshold, forbid_mega):
        import rte_rrtmgp_nn_tpu.drivers.allsky as allsky_mod

        _need(LW_BOTH)
        if not (os.path.exists(self.G) and os.path.exists(self.CLW)):
            pytest.skip("all-sky data not available")
        monkeypatch.setattr(allsky_mod, "ALLSKY_LW_MEGA_MIN_NCOL", threshold)
        calls = []
        for name, forbid in (("_allsky_lw_core_mega", forbid_mega),
                             ("_allsky_lw_core_lay_major", not forbid_mega)):
            orig = getattr(allsky_mod, name)

            def wrapper(*a, _n=name, _f=forbid, _o=orig, **k):
                calls.append(_n)
                if _f:
                    raise AssertionError(f"{_n} must not dispatch here")
                return _o(*a, **k)

            monkeypatch.setattr(allsky_mod, name, wrapper)
        m = [load_model_netcdf(LW_BOTH)]
        with config_override(use_megakernel=True):
            fb = allsky_mod.allsky_lw(self.G, self.CLW, m, ncol=ncol)
        return calls, fb

    def test_below_threshold_takes_staged(self, monkeypatch):
        calls, _ = self._run(monkeypatch, ncol=8, threshold=16,
                             forbid_mega=True)
        assert "_allsky_lw_core_lay_major" in calls

    def test_at_threshold_takes_mega(self, monkeypatch):
        calls, fb = self._run(monkeypatch, ncol=8, threshold=8,
                              forbid_mega=False)
        assert calls and calls[0] == "_allsky_lw_core_mega"

    def test_default_threshold_value(self):
        import rte_rrtmgp_nn_tpu.drivers.allsky as allsky_mod

        # after the round-4 stack-assembly fix the megakernel wins every
        # regime (2.03 vs 3.16 ms at 1800), so the measured threshold is 0
        # (see the module comment; raise only with a fresh measurement)
        assert allsky_mod.ALLSKY_LW_MEGA_MIN_NCOL == 0


class TestPickTileC:
    """r5s3 divisor-aware tile policy: a non-dividing tile makes every
    fused megakernel input pay a ceil-pad copy (78 us of the LW core's
    593 us device time at 1800 cols -- docs/PERFORMANCE.md)."""

    def test_keeps_default_when_it_divides(self):
        from rte_rrtmgp_nn_tpu.ops.pallas.lw_megakernel import pick_tile_c

        assert pick_tile_c(28800, 32, (72, 48, 40, 24, 16, 8)) == 32
        assert pick_tile_c(57600, 64, (120, 96, 72, 64, 48, 40)) == 64

    def test_prefers_first_dividing_candidate(self):
        from rte_rrtmgp_nn_tpu.ops.pallas.lw_megakernel import pick_tile_c

        # 1800 % 32 != 0; 120 is the measured-best divider for LW
        assert pick_tile_c(1800, 32, (120, 96, 72, 64, 48, 40, 24)) == 120
        # all-sky SW keeps a VMEM-conservative list -> 40 at 1800
        assert pick_tile_c(1800, 32, (40, 24, 16, 8)) == 40

    def test_falls_back_to_default_ragged(self):
        from rte_rrtmgp_nn_tpu.ops.pallas.lw_megakernel import pick_tile_c

        # a prime ncol divides nothing: keep the default, ragged last tile
        assert pick_tile_c(1801, 32, (120, 96, 72, 64, 48, 40, 24)) == 32
        assert pick_tile_c(1, 32, (40, 24, 16, 8)) == 32
