"""Fused batched-MLP Pallas kernels for NN gas optics.

The reference's hot path is a stack of BLAS GEMMs with fused bias/activation
plus a postprocessing loop (``mod_network.F90 output_sgemm_flat`` /
``mod_network_rrtmgp.F90 output_sgemm_tau/_lw``, cuBLAS under OpenACC).
Here the WHOLE pipeline -- every layer's GEMM, bias, activation, and the
(ystd*y+ymean)^8 * col_dry / y^2 postprocessing -- runs in ONE Pallas kernel
per batch tile: weights are resident in VMEM (they are tiny: <=256x256),
activations never touch HBM, and each input row is read once and each
output row written once. That makes the op HBM-bandwidth-minimal: traffic
= x + col_dry + outputs, nothing else.

Kernels fall back to interpreter mode off-TPU so the same code path is
exercised by CPU tests.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.network import NNModel, _ACTIVATIONS


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _apply_layers(x, params, activations):
    """Hidden layers + final linear, entirely in registers/VMEM."""
    h = x
    n_layers = len(params) // 2
    for i in range(n_layers - 1):
        w, b = params[2 * i], params[2 * i + 1]
        h = _ACTIVATIONS[activations[i]](
            jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        )
    w, b = params[-2], params[-1]
    return jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]


def _pow8(y):
    y2 = y * y
    y4 = y2 * y2
    return y4 * y4


def _tau_kernel(activations, n_params, *refs):
    x_ref, coldry_ref = refs[0], refs[1]
    params = refs[2 : 2 + n_params]
    ymean_ref, ystd_ref = refs[2 + n_params], refs[3 + n_params]
    out_ref = refs[-1]
    raw = _apply_layers(x_ref[:], params, activations)
    y = ystd_ref[:] * raw + ymean_ref[:]
    out_ref[:] = _pow8(y) * coldry_ref[:]


def _lw_both_kernel(activations, n_params, ngpt, *refs):
    x_ref, coldry_ref = refs[0], refs[1]
    params = refs[2 : 2 + n_params]
    ymean_ref, ystd_ref = refs[2 + n_params], refs[3 + n_params]
    tau_ref, pfrac_ref = refs[-2], refs[-1]
    raw = _apply_layers(x_ref[:], params, activations)
    y = ystd_ref[:] * raw[:, :ngpt] + ymean_ref[:]
    tau_ref[:] = _pow8(y) * coldry_ref[:]
    p = raw[:, ngpt:]
    pfrac_ref[:] = p * p


def _sw_kernel(acts_abs, n_abs, acts_ray, n_ray, *refs):
    """Fused absorption + rayleigh networks + combine (tau_tot, ssa)."""
    x_ref, coldry_ref = refs[0], refs[1]
    p_abs = refs[2 : 2 + n_abs]
    ym_a, ys_a = refs[2 + n_abs], refs[3 + n_abs]
    p_ray = refs[4 + n_abs : 4 + n_abs + n_ray]
    ym_r, ys_r = refs[4 + n_abs + n_ray], refs[5 + n_abs + n_ray]
    tau_ref, ssa_ref = refs[-2], refs[-1]
    raw_a = _apply_layers(x_ref[:], p_abs, acts_abs)
    tau_abs = _pow8(ys_a[:] * raw_a + ym_a[:]) * coldry_ref[:]
    raw_r = _apply_layers(x_ref[:], p_ray, acts_ray)
    tau_ray = _pow8(ys_r[:] * raw_r + ym_r[:]) * coldry_ref[:]
    tau_tot = tau_abs + tau_ray
    tau_ref[:] = tau_tot
    ssa_ref[:] = jnp.where(tau_tot > 0.0, tau_ray / tau_tot, 0.0)


def _flatten_params(model: NNModel):
    out = []
    for w, b in zip(model.weights, model.biases):
        out.append(w)
        out.append(b)
    return out


def _tile_specs(n_params, n_extra_vec, tile_b, nx):
    """BlockSpecs: x/col_dry tiled over batch; weights replicated whole."""
    in_specs = [
        pl.BlockSpec((tile_b, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for _ in range(n_params + n_extra_vec):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return in_specs


def _pad_batch(x, tile_b):
    n = x.shape[0]
    pad = (-n) % tile_b
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, n


def fused_predict_lw_both(
    model: NNModel, x: jnp.ndarray, col_dry: jnp.ndarray, tile_b: int = 512,
    interpret: bool | None = None,
):
    """LW 'both' model: (tau, pfrac), each (..., ngpt), fully fused.

    x: (..., n_inputs) scaled features; col_dry: (...,).
    """
    interpret = _interpret_default() if interpret is None else interpret
    ngpt = model.n_outputs // 2
    lead_shape = x.shape[:-1]
    x2, n = _pad_batch(x.reshape(-1, model.n_inputs), tile_b)
    cd2, _ = _pad_batch(col_dry.reshape(-1, 1), tile_b)
    params = _flatten_params(model)
    acts = model.activations

    kernel = functools.partial(_lw_both_kernel, acts, len(params), ngpt)
    grid = (x2.shape[0] // tile_b,)
    out_shape = (
        jax.ShapeDtypeStruct((x2.shape[0], ngpt), x2.dtype),
        jax.ShapeDtypeStruct((x2.shape[0], ngpt), x2.dtype),
    )
    out_specs = (
        pl.BlockSpec((tile_b, ngpt), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, ngpt), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    tau, pfrac = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_tile_specs(len(params), 2, tile_b, model.n_inputs),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x2, cd2, *params, model.output_mean[:ngpt], model.output_std[:ngpt])
    return (
        tau[:n].reshape(*lead_shape, ngpt),
        pfrac[:n].reshape(*lead_shape, ngpt),
    )


def fused_predict_tau(
    model: NNModel, x: jnp.ndarray, col_dry: jnp.ndarray, tile_b: int = 512,
    interpret: bool | None = None,
):
    """Single-model tau prediction ((ystd*y+ymean)^8 * col_dry), fused."""
    interpret = _interpret_default() if interpret is None else interpret
    ngpt = model.n_outputs
    lead_shape = x.shape[:-1]
    x2, n = _pad_batch(x.reshape(-1, model.n_inputs), tile_b)
    cd2, _ = _pad_batch(col_dry.reshape(-1, 1), tile_b)
    params = _flatten_params(model)
    kernel = functools.partial(_tau_kernel, model.activations, len(params))
    tau = pl.pallas_call(
        kernel,
        grid=(x2.shape[0] // tile_b,),
        in_specs=_tile_specs(len(params), 2, tile_b, model.n_inputs),
        out_specs=pl.BlockSpec((tile_b, ngpt), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], ngpt), x2.dtype),
        interpret=interpret,
    )(x2, cd2, *params, model.output_mean, model.output_std)
    return tau[:n].reshape(*lead_shape, ngpt)


def fused_predict_sw(
    model_abs: NNModel, model_ray: NNModel, x: jnp.ndarray, col_dry: jnp.ndarray,
    tile_b: int = 512, interpret: bool | None = None,
):
    """SW absorption + rayleigh networks with the combine inlined ->
    (tau_tot, ssa), fused in one kernel (the INLINE_COMBINE path of
    predict_nn_sw_blas)."""
    interpret = _interpret_default() if interpret is None else interpret
    ngpt = model_abs.n_outputs
    lead_shape = x.shape[:-1]
    x2, n = _pad_batch(x.reshape(-1, model_abs.n_inputs), tile_b)
    cd2, _ = _pad_batch(col_dry.reshape(-1, 1), tile_b)
    p_abs = _flatten_params(model_abs)
    p_ray = _flatten_params(model_ray)
    kernel = functools.partial(
        _sw_kernel, model_abs.activations, len(p_abs), model_ray.activations, len(p_ray)
    )
    out_specs = (
        pl.BlockSpec((tile_b, ngpt), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, ngpt), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    tau, ssa = pl.pallas_call(
        kernel,
        grid=(x2.shape[0] // tile_b,),
        in_specs=_tile_specs(len(p_abs) + len(p_ray), 4, tile_b, model_abs.n_inputs),
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((x2.shape[0], ngpt), x2.dtype),
            jax.ShapeDtypeStruct((x2.shape[0], ngpt), x2.dtype),
        ),
        interpret=interpret,
    )(
        x2, cd2,
        *p_abs, model_abs.output_mean, model_abs.output_std,
        *p_ray, model_ray.output_mean, model_ray.output_std,
    )
    return (
        tau[:n].reshape(*lead_shape, ngpt),
        ssa[:n].reshape(*lead_shape, ngpt),
    )
