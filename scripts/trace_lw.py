"""Capture a jax.profiler trace of an LW core on the TPU.

Usage: python scripts/trace_lw.py [prep|lay|presrc|mega4] [outdir] [mult]
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
        _lw_core_lay_major,
        _lw_core_mega4,
        _lw_core_prep,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.gasoptics.planck import PlanckTable, lw_spectral_g128
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    which = sys.argv[1] if len(sys.argv) > 1 else "prep"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/lwtrace_{which}"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    dtype = jnp.float32
    from _bench_util import guard_backend

    guard_backend()  # fail fast on a wedged tunnel (CLAUDE.md)
    data = read_rfmip(
        "/root/reference/examples/rfmip-clear-sky/"
        "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc"
    )
    from _bench_util import replicate_rfmip

    data = replicate_rfmip(data, mult)
    ncol = data.ncol
    models = [load_model_netcdf(
        "/root/reference/neural/data/lw-g128-210809_both_BEST.nc")]
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=dtype)
    concs = {k: jnp.asarray(v, dtype) for k, v in data.gas_concs.concs.items()}
    args = jax.device_put((
        jnp.asarray(data.play, dtype), jnp.asarray(data.plev, dtype),
        jnp.asarray(data.tlay, dtype), jnp.asarray(data.tlev, dtype),
        jnp.asarray(data.tsfc, dtype),
        jnp.broadcast_to(
            jnp.asarray(data.sfc_emis, dtype)[:, None], (ncol, spec.nband)),
        concs,
    ))
    cores = {
        "prep": functools.partial(_lw_core_prep, tile_c=32),
        "lay": functools.partial(_lw_core_lay_major, solver_variant="fused"),
        "presrc": functools.partial(_lw_core_lay_major, solver_variant="presrc"),
        "mega4": functools.partial(_lw_core_mega4, tile_c=32),
    }
    fn = jax.jit(functools.partial(
        cores[which], models, table, spec, top_at_1=data.top_at_1))
    jax.block_until_ready(fn(*args))  # compile
    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = fn(*args)
        jax.block_until_ready(out)
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
