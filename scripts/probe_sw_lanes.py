"""Chip probe: SW clear-sky megakernel fused-input vs lanes-direct input
(VERDICT r4 item 2 measurement).

The fused (nlay, ncol, 8) operand pads its 8 lanes to a 128-lane tile
(~2.2 ms DMA at 57.6k) and pays an operand relayout copy (~2.6 ms).
input_mode='lanes' passes each feature as its own well-tiled (nlay, ncol)
ref and assembles the feature matrix IN VMEM -- the same trade LW's
mega5/mega6 measured LOSING at 22 lanes; SW has 8.

Usage: python scripts/probe_sw_lanes.py [mult] [tile]
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        canonicalize_rfmip_inputs,
        resolve_solar_source,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.gas_concs import GasConcs
    from rte_rrtmgp_nn_tpu.gasoptics.nn_gas_optics import (
        compute_nn_inputs_split,
        get_col_dry_lay_major,
    )
    from rte_rrtmgp_nn_tpu.gasoptics.planck import sw_spectral_g112
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf
    from rte_rrtmgp_nn_tpu.ops.pallas.sw_megakernel import (
        sw_clearsky_megakernel,
    )

    # lanes mode requires tile_c % 128 == 0 on hardware (kernel guard),
    # so the default tile is 128 -- the configuration of the recorded
    # 39.5 vs 25.0 ms measurement (docs/PERFORMANCE.md)
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    from _bench_util import guard_backend

    guard_backend()  # fail fast on a wedged tunnel (CLAUDE.md)
    data = read_rfmip(
        "/root/reference/examples/rfmip-clear-sky/"
        "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc")
    from _bench_util import replicate_rfmip

    data = replicate_rfmip(data, mult)
    ncol = data.ncol
    D = "/root/reference/neural/data/"
    models = [load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
              load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc")]
    spec = sw_spectral_g112()
    solar = jnp.asarray(resolve_solar_source(spec), jnp.float32)
    play_t, plev_t, tlay_t, _, concs_t = canonicalize_rfmip_inputs(data)
    gd = GasConcs({k: jnp.asarray(v) for k, v in concs_t.items()})
    nlay = play_t.shape[0]
    col_dry = get_col_dry_lay_major(
        gd.get_vmr("h2o", nlay, ncol), jnp.asarray(plev_t))
    x2d, cf, perm = compute_nn_inputs_split(
        jnp.asarray(play_t), jnp.asarray(tlay_t), gd, models[0], (),
        lay_major=True)
    mu0 = jnp.asarray(np.clip(np.cos(np.deg2rad(data.sza)), 0.01, 1.0),
                      jnp.float32)
    toa = jnp.broadcast_to(solar[None, :], (ncol, spec.ngpt)) * mu0[:, None]
    alb = (jnp.asarray(data.sfc_alb, jnp.float32)[:, None]
           * jnp.ones((1, spec.ngpt), jnp.float32))
    args = jax.device_put((x2d, col_dry, mu0, toa, alb, cf))
    x2d, col_dry, mu0, toa, alb, cf = args
    print(f"ncol = {ncol}  tile = {tile}", flush=True)

    from _bench_util import timed_best

    for mode in ("fused", "lanes"):
        fn = jax.jit(functools.partial(
            sw_clearsky_megakernel, models[0], models[1],
            tile_c=tile, perm=perm, input_mode=mode))
        call = lambda: fn(x2d, col_dry, mu0, toa, alb, alb, const_feats=cf)
        best = timed_best(call, ())
        out = call()
        print(f"{mode:6s}: {best:8.3f} ms   mean_dn "
              f"{float(np.mean(np.asarray(out[1]))):.4f}", flush=True)


if __name__ == "__main__":
    main()
