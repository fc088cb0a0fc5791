"""Train a fresh SW absorption emulator end-to-end (demonstration).

SW counterpart of scripts/train_demo.py (reference ML pipeline, SURVEY.md
section 3.4): distill the shipped sw-g112 absorption BEST model into a
smaller network on real RFMIP atmospheres with the hybrid expdiff loss,
score each epoch with the full SW radiation scheme against the teacher's
own fluxes (radiation-in-the-loop early stopping), and save the best model
in the reference netCDF format (score-encoded filename,
ml_train.py:493-517 convention). The Rayleigh net is the harder-to-improve
of the pair (its outputs are nearly atmosphere-independent per g-point),
so the demo distills the absorption net and keeps the teacher's Rayleigh
net, exactly as the reference trains the two nets as separate models.

Run:  JAX_PLATFORMS=cpu python scripts/train_demo_sw.py [--epochs N]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rte_rrtmgp_nn_tpu.drivers.rfmip import default_solar_source
from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
from rte_rrtmgp_nn_tpu.gasoptics.nn_gas_optics import (
    compute_nn_inputs,
    get_col_dry,
    predict_nn_sw,
)
from rte_rrtmgp_nn_tpu.gasoptics.planck import sw_spectral_g112
from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf
from rte_rrtmgp_nn_tpu.optical_props import OpticalProps2str
from rte_rrtmgp_nn_tpu.rte import rte_sw
from rte_rrtmgp_nn_tpu.training.eval_loop import (
    eval_metrics,
    train_with_radiation_eval,
)
from rte_rrtmgp_nn_tpu.training.train import (
    TrainState,
    init_model,
    make_train_step,
)

RFMIP = (
    "/root/reference/examples/rfmip-clear-sky/"
    "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc"
)
T_ABS = "/root/reference/neural/data/sw-g112-210809_absorption_BEST.nc"
T_RAY = "/root/reference/neural/data/sw-g112-210809_rayleigh_BEST.nc"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--hidden", type=int, default=48)
    ap.add_argument("--steps-per-epoch", type=int, default=400)
    ap.add_argument("--alpha", type=float, default=0.6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch-pairs", type=int, default=1024)
    ap.add_argument("--patience", type=int, default=15)
    ap.add_argument("--init-from", default=None, metavar="MODEL_NC")
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts"))
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    t_abs = load_model_netcdf(T_ABS)
    t_ray = load_model_netcdf(T_RAY)
    data = read_rfmip(RFMIP)
    spec = sw_spectral_g112()
    ncol, nlay = data.play.shape
    nf = len(t_abs.input_names)
    ngpt = t_abs.n_outputs

    play, plev = jnp.asarray(data.play), jnp.asarray(data.plev)
    tlay = jnp.asarray(data.tlay)
    x = compute_nn_inputs(play, tlay, data.gas_concs, t_abs)
    y_raw = t_abs.apply_raw(x)
    xs = np.asarray(x).reshape(-1, nf)
    ys = np.asarray(y_raw).reshape(-1, ngpt)
    col_dry = get_col_dry(data.gas_concs.get_vmr("h2o", ncol, nlay), plev)

    # SW boundary conditions (rrtmgp_rfmip_sw.F90): day-column masking,
    # TSI renormalization, band albedo expanded to g-points
    mu0 = jnp.asarray(np.cos(np.deg2rad(data.sza)), jnp.float32)
    usecol = jnp.asarray(data.sza < 90.0)
    mu0_safe = jnp.where(usecol, mu0, 1.0)
    solar = jnp.asarray(default_solar_source(spec), jnp.float32)
    toa = jnp.broadcast_to(solar[None, :], (ncol, spec.ngpt))
    toa = toa * (jnp.asarray(data.tsi, jnp.float32) / jnp.sum(toa, -1))[:, None]
    alb = jnp.asarray(data.sfc_alb, jnp.float32)[:, None] * jnp.ones((1, spec.ngpt), jnp.float32)
    x_full = jnp.asarray(xs.reshape(ncol, nlay, nf), jnp.float32)
    mask = np.asarray(usecol)[:, None]

    @jax.jit
    def flux_of(model_abs):
        tau, ssa = predict_nn_sw([model_abs, t_ray], x_full, col_dry)
        atmos = OpticalProps2str(tau, ssa, jnp.zeros_like(tau), spec)
        sol = rte_sw(atmos, data.top_at_1, mu0_safe, toa, alb, alb,
                     broadband=True)
        return sol.flux_up, sol.flux_dn

    def masked_fluxes(model_abs):
        up, dn = flux_of(model_abs)
        return np.asarray(up) * mask, np.asarray(dn) * mask

    ref_up, ref_dn = masked_fluxes(t_abs)

    if args.init_from:
        student = load_model_netcdf(args.init_from)
    else:
        student = init_model(
            [nf, args.hidden, args.hidden, ngpt], jax.random.PRNGKey(0),
            input_names=t_abs.input_names,
            input_min=t_abs.input_min, input_max=t_abs.input_max,
            output_mean=t_abs.output_mean, output_std=t_abs.output_std,
        )
    import optax

    total_steps = args.epochs * args.steps_per_epoch
    optimizer = optax.adam(
        optax.cosine_decay_schedule(args.lr, total_steps, alpha=1e-2))
    state = TrainState(student, optimizer.init(student),
                       jnp.zeros((), jnp.int32))
    step_inner = jax.jit(make_train_step(optimizer, alpha=args.alpha))

    npairs = args.batch_pairs
    pair_idx = jnp.stack(
        [jnp.arange(npairs), jnp.arange(npairs) + npairs], axis=1)

    def train_step(st, xb, yb):
        return step_inner(st, xb, yb, pair_idx)

    EVAL_PAIRS = np.array([(0, 1), (3, 0), (3, 1), (0, 10), (0, 9)])
    nexp, nsites = data.nexp, data.nsites
    rng = np.random.default_rng(0)
    xs_j, ys_j = jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32)

    def data_iter():
        site = rng.integers(0, nsites, npairs)
        lay = rng.integers(0, nlay, npairs)
        n_eval = npairs // 2
        ab = EVAL_PAIRS[rng.integers(0, len(EVAL_PAIRS), n_eval)]
        ra = rng.integers(0, nexp, npairs - n_eval)
        rb = (ra + rng.integers(1, nexp, npairs - n_eval)) % nexp
        ea = np.concatenate([ab[:, 0], ra])
        eb = np.concatenate([ab[:, 1], rb])
        rows_a = (ea * nsites + site) * nlay + lay
        rows_b = (eb * nsites + site) * nlay + lay
        idx = np.concatenate([rows_a, rows_b])
        return xs_j[idx], ys_j[idx]

    def eval_fn(model):
        up, dn = masked_fluxes(model)
        return eval_metrics(
            up, dn, ref_up, ref_dn,
            np.asarray(data.plev, np.float64), data.nexp,
            top_at_1=data.top_at_1,
        )

    # normalized by the published RRTMGP-vs-LBL error levels (BASELINE.md)
    ref_scores = np.array([0.1, 0.1, 0.2, 0.05, 0.05, 0.1, 0.02, 0.02])
    save_tmpl = os.path.join(
        args.out_dir,
        f"sw-g112-demo_absorption_{args.hidden}_{args.hidden}"
        + "_HR_{hr}_FRC_{frc}.nc")
    result = train_with_radiation_eval(
        state, train_step, data_iter, eval_fn, ref_scores,
        n_epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
        patience=args.patience, save_path=save_tmpl,
    )
    print(f"best radiation score {result.best_score:.3f} "
          f"at epoch {result.best_epoch}")
    m = result.history[result.best_epoch]["metrics"]
    print(f"vs teacher: HR MAE {m[0]:.4f} K/d, TOA bias {m[2]:.4f} W/m2")
    return 0


if __name__ == "__main__":
    sys.exit(main())
