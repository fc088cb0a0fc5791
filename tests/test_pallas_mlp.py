"""Fused Pallas MLP kernels vs the pure-jnp reference path (interpreter
mode on CPU; the identical kernel code compiles for TPU)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.gasoptics.nn_gas_optics import (
    predict_nn_lw,
    predict_nn_sw,
    predict_pfrac,
    predict_tau,
)
from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf
from rte_rrtmgp_nn_tpu.ops.pallas.mlp import (
    fused_predict_lw_both,
    fused_predict_sw,
    fused_predict_tau,
)

D = "/root/reference/neural/data/"


def _model(name):
    p = os.path.join(D, name)
    if not os.path.exists(p):
        pytest.skip(f"{name} not available")
    return load_model_netcdf(p)


@pytest.fixture(scope="module")
def batch(rng=None):
    r = np.random.default_rng(7)
    x = jnp.asarray(r.uniform(0.0, 1.0, (3, 70, 18)), jnp.float32)
    cd = jnp.asarray(r.uniform(1e20, 5e21, (3, 70)), jnp.float32)
    return x, cd


class TestFusedKernels:
    def test_lw_both_matches_jnp(self, batch):
        m = _model("lw-g128-210809_both_BEST.nc")
        x, cd = batch
        tau_p, pf_p = fused_predict_lw_both(m, x, cd, tile_b=128, interpret=True)
        tau_j, pf_j = predict_nn_lw([m], x, cd, use_pallas=False)
        np.testing.assert_allclose(np.asarray(tau_p), np.asarray(tau_j), rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(pf_p), np.asarray(pf_j), rtol=2e-5, atol=1e-9)

    def test_tau_matches_jnp(self, batch):
        m = _model("lw-g128-210809_absorption_BEST.nc")
        x, cd = batch
        tau_p = fused_predict_tau(m, x, cd, tile_b=128, interpret=True)
        tau_j = predict_tau(m, x, cd)
        np.testing.assert_allclose(np.asarray(tau_p), np.asarray(tau_j), rtol=2e-5, atol=1e-8)

    def test_sw_matches_jnp(self, batch):
        ma = _model("sw-g112-210809_absorption_BEST.nc")
        mr = _model("sw-g112-210809_rayleigh_BEST.nc")
        x, cd = batch
        x7 = x[..., :7]
        tau_p, ssa_p = fused_predict_sw(ma, mr, x7, cd, tile_b=128, interpret=True)
        tau_j, ssa_j = predict_nn_sw([ma, mr], x7, cd, use_pallas=False)
        np.testing.assert_allclose(np.asarray(tau_p), np.asarray(tau_j), rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(ssa_p), np.asarray(ssa_j), rtol=2e-5, atol=2e-5)

    def test_ragged_batch_padding(self):
        """Batch sizes that don't divide the tile are padded and trimmed."""
        m = _model("lw-g128-210809_both_BEST.nc")
        r = np.random.default_rng(3)
        x = jnp.asarray(r.uniform(0, 1, (5, 13, 18)), jnp.float32)  # 65 rows
        cd = jnp.asarray(r.uniform(1e20, 5e21, (5, 13)), jnp.float32)
        tau_p, _ = fused_predict_lw_both(m, x, cd, tile_b=128, interpret=True)
        tau_j, _ = predict_nn_lw([m], x, cd, use_pallas=False)
        assert tau_p.shape == tau_j.shape == (5, 13, 128)
        np.testing.assert_allclose(np.asarray(tau_p), np.asarray(tau_j), rtol=2e-5, atol=1e-8)
