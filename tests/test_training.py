"""Training pipeline tests: gendata -> train -> radiation-in-the-loop eval.

A miniature end-to-end replication of the reference's ML pipeline (SURVEY.md
section 3.4) on a synthetic k-distribution: generate training data with the
LUT path, train a small emulator on tau targets, evaluate with the 8-metric
radiation score, early-stop, save the best model in the reference format.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.drivers.rfmip_io import RFMIPData
from rte_rrtmgp_nn_tpu.gas_concs import GasConcs
from rte_rrtmgp_nn_tpu.gasoptics.kdist import load_kdist
from rte_rrtmgp_nn_tpu.gasoptics.synthetic import generate_kdist_nc
from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf
from rte_rrtmgp_nn_tpu.training.eval_loop import (
    METRIC_NAMES,
    eval_metrics,
    radiation_score,
    train_with_radiation_eval,
)
from rte_rrtmgp_nn_tpu.training.gendata import (
    generate_lw_training_data,
    load_training_data,
)
from rte_rrtmgp_nn_tpu.training.train import (
    create_train_state,
    init_model,
    make_train_step,
    scale_outputs_tau,
    standardize_coeffs,
)

from test_lut_gas_optics import GASES


@pytest.fixture(scope="module")
def lw_kd(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("kd") / "lw.nc")
    generate_kdist_nc(p, kind="lw", gpts_per_band=4, nband=16)
    return load_kdist(p, GASES)


@pytest.fixture(scope="module")
def mini_rfmip():
    """A small RFMIP-like dataset: 3 'experiments' x 8 sites x 16 layers."""
    rng = np.random.default_rng(5)
    nexp, nsite, nlay = 3, 8, 16
    ncol = nexp * nsite
    plev = np.exp(np.linspace(np.log(40.0), np.log(101325.0), nlay + 1))
    plev = np.broadcast_to(plev, (ncol, nlay + 1)).astype(np.float64)
    play = 0.5 * (plev[:, 1:] + plev[:, :-1])
    tlay = 230 + 60 * (play / play.max()) ** 0.3 + rng.uniform(-3, 3, (ncol, nlay))
    tlev = np.concatenate([tlay[:, :1], 0.5 * (tlay[:, 1:] + tlay[:, :-1]), tlay[:, -1:]], 1)
    tsfc = tlev[:, -1] + 2.0
    co2 = np.repeat([4e-4, 2.8e-4, 8e-4], nsite)[:, None] * np.ones((1, nlay))
    gc = GasConcs.create(
        {"h2o": 3e-3 * (play / play.max()) ** 1.5 + 1e-6, "co2": co2, "o3": 5e-7,
         "n2o": 3.2e-7, "ch4": 1.8e-6}
    )
    return RFMIPData(
        play=play.astype(np.float32), plev=plev.astype(np.float32),
        tlay=tlay.astype(np.float32), tlev=tlev.astype(np.float32),
        tsfc=tsfc.astype(np.float32),
        sfc_emis=np.full(ncol, 0.98, np.float32), sfc_alb=np.full(ncol, 0.1, np.float32),
        sza=np.full(ncol, 45.0, np.float32), tsi=np.full(ncol, 1361.0, np.float32),
        gas_concs=gc, nexp=nexp, nsites=nsite, nlay=nlay, top_at_1=True,
    )


class TestGendata:
    def test_roundtrip(self, lw_kd, mini_rfmip, tmp_path):
        p = str(tmp_path / "train.nc")
        out = generate_lw_training_data(p, lw_kd, mini_rfmip)
        assert out["tau_lw_gas"].shape == (3, 8, 16, 64)
        assert out["planck_fraction"].shape == (3, 8, 16, 64)
        x, y, cd = load_training_data(p, "lw_absorption")
        assert x.shape == (3 * 8 * 16, 7) and y.shape == (3 * 8 * 16, 64)
        np.testing.assert_allclose(
            y.reshape(3, 8, 16, 64), out["tau_lw_gas"], rtol=1e-6
        )
        x2, y2, _ = load_training_data(p, "lw_both")
        assert y2.shape[-1] == 128

    def test_pfrac_band_sums(self, lw_kd, mini_rfmip, tmp_path):
        p = str(tmp_path / "train2.nc")
        out = generate_lw_training_data(p, lw_kd, mini_rfmip)
        sums = out["planck_fraction"].sum(-1)
        np.testing.assert_allclose(sums, lw_kd.nband, rtol=1e-4)


class TestTrainLoop:
    def test_emulator_learns_and_early_stops(self, lw_kd, mini_rfmip, tmp_path):
        p = str(tmp_path / "train.nc")
        generate_lw_training_data(p, lw_kd, mini_rfmip)
        x, y_tau, cd = load_training_data(p, "lw_absorption")
        # output scaling: (tau/col_dry)^(1/8), standardized
        y = np.asarray(scale_outputs_tau(jnp.asarray(y_tau), jnp.asarray(cd)))
        ymean, ystd = standardize_coeffs(y)
        y_scaled = (y - ymean) / ystd
        # input min-max scaling
        xmin, xmax = x.min(0), x.max(0) + 1e-9
        x_scaled = (x - xmin) / (xmax - xmin)

        model = init_model(
            [x.shape[-1], 24, 24, y.shape[-1]], jax.random.PRNGKey(0),
            input_min=xmin, input_max=xmax, output_mean=ymean, output_std=ystd,
        )
        state, optimizer = create_train_state(model, learning_rate=3e-3)
        train_step = jax.jit(make_train_step(optimizer))

        rng = np.random.default_rng(0)
        xs, ys = jnp.asarray(x_scaled, jnp.float32), jnp.asarray(y_scaled, jnp.float32)

        def data_iter():
            idx = rng.integers(0, xs.shape[0], 128)
            return xs[idx], ys[idx]

        # reference-flux eval: candidate tau -> flux vs the LUT "truth"
        from rte_rrtmgp_nn_tpu.gasoptics.lut_gas_optics import gas_optics_lw_lut
        from rte_rrtmgp_nn_tpu.gasoptics.nn_gas_optics import predict_tau
        from rte_rrtmgp_nn_tpu.optical_props import OpticalProps1scl
        from rte_rrtmgp_nn_tpu.rte import rte_lw
        from rte_rrtmgp_nn_tpu.fluxes import reduce_broadband

        d = mini_rfmip
        props_ref, sources = gas_optics_lw_lut(
            lw_kd, jnp.asarray(d.play), jnp.asarray(d.plev), jnp.asarray(d.tlay),
            jnp.asarray(d.tsfc), d.gas_concs, tlev=jnp.asarray(d.tlev),
        )
        emis = jnp.broadcast_to(jnp.asarray(d.sfc_emis)[:, None], (d.ncol, lw_kd.nband))
        ref_sol = rte_lw(props_ref, True, sources, emis)
        ref_fb = reduce_broadband(ref_sol.flux_up, ref_sol.flux_dn)
        xs_full = jnp.asarray(x_scaled.reshape(d.ncol, d.nlay, -1), jnp.float32)
        cd_full = jnp.asarray(cd.reshape(d.ncol, d.nlay), jnp.float32)

        @jax.jit
        def flux_of(model):
            tau = predict_tau(model, xs_full, cd_full)
            sol = rte_lw(OpticalProps1scl(tau, lw_kd.spectral), True, sources, emis)
            fb = reduce_broadband(sol.flux_up, sol.flux_dn)
            return fb.flux_up, fb.flux_dn

        def eval_fn(model):
            up, dn = flux_of(model)
            return eval_metrics(
                np.asarray(up), np.asarray(dn),
                np.asarray(ref_fb.flux_up), np.asarray(ref_fb.flux_dn),
                np.asarray(d.plev, np.float64), d.nexp,
            )

        ref_scores = np.array([0.5, 0.5, 0.5, 0.05, 0.05, 0.05, 0.02, 0.02])
        save_tmpl = str(tmp_path / "model_HR_{hr}_FRC_{frc}.nc")
        result = train_with_radiation_eval(
            state, train_step, data_iter, eval_fn, ref_scores,
            n_epochs=8, steps_per_epoch=60, patience=8, save_path=save_tmpl,
            verbose=False,
        )
        scores = [h["score"] for h in result.history]
        assert result.best_score < scores[0]  # training improves the score
        assert result.best_score < np.inf and len(result.history) >= 2
        # saved model loads back and drives the same flux
        import glob

        saved = glob.glob(str(tmp_path / "model_HR_*"))
        assert len(saved) == 1
        m2 = load_model_netcdf(saved[0])
        up1, _ = flux_of(result.best_model)
        up2, _ = flux_of(m2)
        np.testing.assert_allclose(np.asarray(up1), np.asarray(up2), rtol=1e-5)

    def test_metric_names_parity(self):
        assert len(METRIC_NAMES) == 8
        assert METRIC_NAMES[0] == "MAE HR (all)"
