"""Capture a jax.profiler trace of the SW megakernel core on the TPU.

Usage: python scripts/trace_sw.py [outdir] [mult] [tile]
Then summarize with scripts/trace_summarize.py.
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
        _sw_core_mega,
        _sw_core_mega_canon,
        canonicalize_rfmip_inputs,
        resolve_solar_source,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.gasoptics.planck import sw_spectral_g112
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/swtrace"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    from _bench_util import guard_backend

    guard_backend()  # fail fast on a wedged tunnel (CLAUDE.md)
    data = read_rfmip(
        "/root/reference/examples/rfmip-clear-sky/"
        "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc"
    )
    from _bench_util import replicate_rfmip

    data = replicate_rfmip(data, mult)
    ncol = data.ncol
    D = "/root/reference/neural/data/"
    models = [load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
              load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc")]
    spec = sw_spectral_g112()
    solar = jnp.asarray(resolve_solar_source(spec), jnp.float32)
    mu0 = np.cos(np.deg2rad(data.sza))
    usecol = data.sza < 90.0 - 0.5 * np.finfo(np.float32).eps
    legacy = os.environ.get("TRACE_SW_LEGACY", "0") == "1"
    if legacy:
        # the pre-canonical core: flips/transposes in-jit
        args = jax.device_put((
            jnp.asarray(data.play, jnp.float32),
            jnp.asarray(data.plev, jnp.float32),
            jnp.asarray(data.tlay, jnp.float32),
            jnp.asarray(data.sfc_alb, jnp.float32),
            jnp.asarray(mu0, jnp.float32), jnp.asarray(usecol),
            jnp.asarray(data.tsi, jnp.float32),
            {k: jnp.asarray(v, jnp.float32)
             for k, v in data.gas_concs.concs.items()},
        ))
        core = _sw_core_mega
    else:
        # production path: host-side canonicalization, zero in-jit layout
        play_t, plev_t, tlay_t, _, concs_t = canonicalize_rfmip_inputs(data)
        args = jax.device_put((
            jnp.asarray(play_t, jnp.float32),
            jnp.asarray(plev_t, jnp.float32),
            jnp.asarray(tlay_t, jnp.float32),
            jnp.asarray(data.sfc_alb, jnp.float32),
            jnp.asarray(mu0, jnp.float32), jnp.asarray(usecol),
            jnp.asarray(data.tsi, jnp.float32),
            {k: jnp.asarray(v, jnp.float32) for k, v in concs_t.items()},
        ))
        core = _sw_core_mega_canon
    print(f"ncol = {ncol}  tile = {tile}  legacy = {legacy}", flush=True)
    fn = jax.jit(functools.partial(
        core, models, spec, solar, top_at_1=data.top_at_1,
        tile_c=tile))
    jax.block_until_ready(fn(*args))  # compile
    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = fn(*args)
        jax.block_until_ready(out)
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
