"""Radiation-in-the-loop evaluation and early stopping.

Reference parity: the eval drivers ``rrtmgp_lw_eval_nn_rfmip.F90`` (8
scalar error metrics vs reference fluxes: pressure-weighted heating-rate
MAE all-experiments and present-day, TOA upwelling bias, and five
radiative-forcing biases between experiment pairs; :452-603) and the Keras
callback ``RunRadiationScheme`` (ml_trainfuncs_keras.py:85-213: run the
scheme each epoch, normalize metrics by the reference scheme's own scores,
early-stop on the RMS "radiation score" with best-weights restore).

TPU-first: the reference round-trips through a Fortran subprocess writing
netCDF each epoch; here the full RFMIP flux evaluation is an in-process
jitted function over the candidate model pytree -- no serialization, no
process boundary. The heavy part (fluxes, heating rates) runs on-device;
the 8 scalar reductions in ``eval_metrics`` are host numpy on the pulled
(ncol, nlev) fluxes -- microseconds of work, and the forcing pairs index
specific experiments, which a 'col'-sharded psum cannot express without a
gather. Multi-chip runs reduce flux errors with
``parallel.shard_ops.weighted_error_stats`` instead
(tests/test_sharding.py pins the two implementations to each other).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..extensions.heating_rates import compute_heating_rate_kday
from ..models.network import NNModel, save_model_netcdf

METRIC_NAMES = (
    "MAE HR (all)",
    "MAE HR (PD)",
    "Bias TOA upwelling",
    "Bias RF-TOA (PI->PD)",
    "Bias RF-TOA (PD->future)",
    "Bias RF-SFC (PI->future)",
    "Bias RF-SFC N2O (PI->PD)",
    "Bias RF-SFC CH4 (PI->PD)",
)

# Experiment pairs for the forcing metrics, 0-based indices into the RFMIP
# experiment axis (reference uses 1-based iref/iexp: (1,2), (4,1), (4,2),
# (1,11), (1,10)).
_RF_PAIRS_TOA = [(0, 1), (3, 0)]  # (PI->PD), (PD->future): TOA up
_RF_PAIRS_SFC = [(3, 1), (0, 10), (0, 9)]  # (PI->future), N2O, CH4: sfc dn


def _mae_presweight(hr_a, hr_b, plev):
    """Pressure-weighted heating-rate MAE (reference mae_presweight):
    weight each layer by its pressure thickness."""
    dp = np.abs(plev[..., 1:] - plev[..., :-1])
    w = dp / dp.sum(axis=-1, keepdims=True)
    return float(np.mean(np.sum(w * np.abs(hr_a - hr_b), axis=-1)))


def eval_metrics(
    flux_up: np.ndarray,
    flux_dn: np.ndarray,
    ref_up: np.ndarray,
    ref_dn: np.ndarray,
    plev: np.ndarray,
    nexp: int,
    top_at_1: bool = True,
) -> np.ndarray:
    """The 8 scalar error metrics of the reference eval driver.

    Arrays are (ncol = nexp*nsites, nlev); plev (ncol, nlev).
    """
    nsites = flux_up.shape[0] // nexp

    def exp_view(a):
        return a.reshape(nexp, nsites, -1)

    toa = 0 if top_at_1 else -1
    sfc = -1 if top_at_1 else 0

    hr = compute_heating_rate_kday(jnp.asarray(flux_up), jnp.asarray(flux_dn), jnp.asarray(plev))
    hr_ref = compute_heating_rate_kday(jnp.asarray(ref_up), jnp.asarray(ref_dn), jnp.asarray(plev))
    hr, hr_ref = np.asarray(hr), np.asarray(hr_ref)

    m = np.zeros(8)
    m[0] = _mae_presweight(hr, hr_ref, plev)
    m[1] = _mae_presweight(hr[:nsites], hr_ref[:nsites], plev[:nsites])
    m[2] = float(np.mean(flux_up[:, toa] - ref_up[:, toa]))

    up_e, dn_e = exp_view(flux_up), exp_view(flux_dn)
    upr_e, dnr_e = exp_view(ref_up), exp_view(ref_dn)

    def rf_toa(iref, iexp):
        # forcing = -(up[iexp] - up[iref]) at TOA; metric = ref - candidate bias
        cand = -(up_e[iexp, :, toa] - up_e[iref, :, toa]).mean()
        ref = -(upr_e[iexp, :, toa] - upr_e[iref, :, toa]).mean()
        return ref - cand

    def rf_sfc(iref, iexp):
        cand = (dn_e[iref, :, sfc] - dn_e[iexp, :, sfc]).mean()
        ref = (dnr_e[iref, :, sfc] - dnr_e[iexp, :, sfc]).mean()
        return ref - cand

    def safe(fn, pair):
        # datasets smaller than the full 18-experiment RFMIP lack some
        # forcing pairs; report 0 for those metrics
        return fn(*pair) if max(pair) < nexp else 0.0

    m[3] = safe(rf_toa, _RF_PAIRS_TOA[0])
    m[4] = safe(rf_toa, _RF_PAIRS_TOA[1])
    m[5] = safe(rf_sfc, _RF_PAIRS_SFC[0])
    m[6] = safe(rf_sfc, _RF_PAIRS_SFC[1])
    m[7] = safe(rf_sfc, _RF_PAIRS_SFC[2])
    return m


def radiation_score(metrics: np.ndarray, ref_scores: np.ndarray) -> float:
    """RMS of metrics normalized by the reference scheme's own error levels
    (reference RunRadiationScheme: score = rms(metric_i / refscore_i))."""
    r = metrics / np.where(np.abs(ref_scores) > 0, np.abs(ref_scores), 1.0)
    return float(np.sqrt(np.mean(r * r)))


@dataclasses.dataclass
class EarlyStopResult:
    best_model: NNModel
    best_score: float
    best_epoch: int
    history: list


def train_with_radiation_eval(
    state,
    train_step: Callable,
    data_iter: Callable,
    eval_fn: Callable[[NNModel], np.ndarray],
    ref_scores: np.ndarray,
    n_epochs: int = 100,
    steps_per_epoch: int = 100,
    patience: int = 70,
    save_path: Optional[str] = None,
    verbose: bool = True,
) -> EarlyStopResult:
    """The training loop with per-epoch radiation evaluation.

    eval_fn(model) -> 8 metrics (an in-process jitted RFMIP evaluation);
    early stop on the radiation score with best-weights restore
    (ml_trainfuncs_keras.py:126-209). If ``save_path``, the best model is
    written as a reference-format netCDF with the score in the filename
    (ml_train.py:493-517 naming convention).
    """
    best = EarlyStopResult(state.model, np.inf, -1, [])
    bad_epochs = 0
    for epoch in range(n_epochs):
        loss = None
        for _ in range(steps_per_epoch):
            x, y = data_iter()
            state, loss = train_step(state, x, y)
        metrics = eval_fn(state.model)
        score = radiation_score(metrics, ref_scores)
        best.history.append({"epoch": epoch, "loss": float(loss), "score": score,
                             "metrics": metrics.tolist()})
        if verbose:
            print(f"epoch {epoch}: loss {float(loss):.5f} radiation_score {score:.4f}")
        if score < best.best_score:
            best = dataclasses.replace(
                best, best_model=state.model, best_score=score, best_epoch=epoch
            )
            bad_epochs = 0
        else:
            bad_epochs += 1
            if bad_epochs >= patience:
                break
    if save_path is not None:
        hr_rel = best.history[best.best_epoch]["metrics"][0] / max(abs(ref_scores[0]), 1e-12)
        frc_rel = max(
            abs(m) / max(abs(r), 1e-12)
            for m, r in zip(best.history[best.best_epoch]["metrics"][3:], ref_scores[3:])
        )
        path = save_path.format(hr=f"{hr_rel:.2e}", frc=f"{frc_rel:.2e}")
        save_model_netcdf(path, best.best_model)
        if verbose:
            print(f"saved best model (epoch {best.best_epoch}) to {path}")
    return best
