"""Capture a jax.profiler trace of the ALL-SKY SW megakernel core on TPU.

The all-sky analogue of trace_sw.py (VERDICT r4 item 1): Garand atmospheres
replicated to --ncol columns, idealized clouds, LUT cloud optics -- the
production _allsky_sw_core_mega path (reference timing role
rrtmgp_allsky.F90:469-475). Summarize with scripts/trace_summarize.py.

Usage: python scripts/trace_allsky_sw.py [outdir] [ncol] [tile] [lw|sw]
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

REF = "/root/reference"
GARAND = os.path.join(REF, "examples/all-sky/garand-atmos-1.nc")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_nn_tpu.drivers.allsky import (
        _allsky_lw_core_mega,
        _allsky_sw_core_mega,
        canonicalize_allsky_inputs,
        load_cloud_optics_checked,
        make_clouds,
    )
    from rte_rrtmgp_nn_tpu.drivers.allsky_io import read_garand
    from rte_rrtmgp_nn_tpu.drivers.rfmip import resolve_solar_source
    from rte_rrtmgp_nn_tpu.gasoptics.planck import (
        PlanckTable,
        lw_spectral_g128,
        sw_spectral_g112,
    )
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/allskyswtrace"
    ncol = int(sys.argv[2]) if len(sys.argv) > 2 else 28800
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    band = sys.argv[4] if len(sys.argv) > 4 else "sw"
    dtype = jnp.float32

    D = os.path.join(REF, "neural/data/")
    atm = read_garand(GARAND, ncol)
    top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
    sfc_lev = -1 if top_at_1 else 0
    co = load_cloud_optics_checked(os.path.join(
        REF, f"extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-{band}.nc"))
    lwp, iwp, rel, rei = make_clouds(atm.play, atm.tlay, co)
    fields, concs_t = canonicalize_allsky_inputs(
        atm.play, atm.plev, atm.tlay, atm.tlev, lwp, iwp, rel, rei,
        atm.gas_concs, top_at_1)
    play_t, plev_t, tlay_t, tlev_t, lwp_t, iwp_t, rel_t, rei_t = (
        jnp.asarray(a, dtype) for a in fields)
    concs = {k: jnp.asarray(v, dtype) for k, v in concs_t.items()}

    if band == "sw":
        models = [load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
                  load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc")]
        spec = sw_spectral_g112()
        solar = jnp.asarray(resolve_solar_source(spec), dtype)
        mu0 = jnp.full((ncol,), 0.86, dtype)
        alb = jnp.full((ncol, spec.nband), 0.06, dtype)
        args = jax.device_put((play_t, plev_t, tlay_t, mu0, alb, alb,
                               lwp_t, iwp_t, rel_t, rei_t, concs))
        fn = jax.jit(functools.partial(
            _allsky_sw_core_mega, models, spec, solar, co,
            top_at_1=top_at_1, tile_c=tile))
    else:
        models = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
        spec = lw_spectral_g128()
        table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=dtype)
        tsfc = jnp.asarray(atm.tlev[:, sfc_lev], dtype)
        emis = jnp.full((ncol, spec.nband), 0.98, dtype)
        args = jax.device_put((play_t, plev_t, tlay_t, tlev_t, tsfc, emis,
                               lwp_t, iwp_t, rel_t, rei_t, concs))
        fn = jax.jit(functools.partial(
            _allsky_lw_core_mega, models, table, spec, co,
            top_at_1=top_at_1, tile_c=tile))

    print(f"ncol = {ncol}  tile = {tile}  band = {band}", flush=True)
    jax.block_until_ready(fn(*args))  # compile
    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = fn(*args)
        jax.block_until_ready(out)
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
