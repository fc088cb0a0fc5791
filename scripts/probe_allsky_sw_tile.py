"""Chip probe: all-sky SW megakernel tile_c sweep (VERDICT r5).

The driver pins tile_c=32 ("48 OOMs VMEM") -- a note that predates the
100 MiB vmem_limit_bytes raise. Times _allsky_sw_core_mega at several
tiles at one column count.

Usage: python scripts/probe_allsky_sw_tile.py [ncol] [tile ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

REF = "/root/reference"


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_nn_tpu.drivers.allsky import (
        _allsky_sw_core_mega,
        canonicalize_allsky_inputs,
        load_cloud_optics_checked,
        make_clouds,
    )
    from rte_rrtmgp_nn_tpu.drivers.allsky_io import read_garand
    from rte_rrtmgp_nn_tpu.drivers.rfmip import resolve_solar_source
    from rte_rrtmgp_nn_tpu.gasoptics.planck import sw_spectral_g112
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    ncol = int(sys.argv[1]) if len(sys.argv) > 1 else 28800
    tiles = [int(t) for t in sys.argv[2:]] or [32, 48, 64]
    dtype = jnp.float32

    D = os.path.join(REF, "neural/data/")
    atm = read_garand(os.path.join(REF, "examples/all-sky/garand-atmos-1.nc"),
                      ncol)
    top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
    co = load_cloud_optics_checked(os.path.join(
        REF, "extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-sw.nc"))
    lwp, iwp, rel, rei = make_clouds(atm.play, atm.tlay, co)
    fields, concs_t = canonicalize_allsky_inputs(
        atm.play, atm.plev, atm.tlay, atm.tlev, lwp, iwp, rel, rei,
        atm.gas_concs, top_at_1)
    play_t, plev_t, tlay_t, _, lwp_t, iwp_t, rel_t, rei_t = (
        jnp.asarray(a, dtype) for a in fields)
    concs = {k: jnp.asarray(v, dtype) for k, v in concs_t.items()}
    models = [load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
              load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc")]
    spec = sw_spectral_g112()
    solar = jnp.asarray(resolve_solar_source(spec), dtype)
    mu0 = jnp.full((ncol,), 0.86, dtype)
    alb = jnp.full((ncol, spec.nband), 0.06, dtype)
    args = jax.device_put((play_t, plev_t, tlay_t, mu0, alb, alb,
                           lwp_t, iwp_t, rel_t, rei_t, concs))
    print(f"ncol = {ncol}", flush=True)
    for tile in tiles:
        fn = jax.jit(functools.partial(
            _allsky_sw_core_mega, models, spec, solar, co,
            top_at_1=top_at_1, tile_c=tile))
        try:
            out = fn(*args)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001
            print(f"tile {tile:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        import numpy as np
        print(f"tile {tile:3d}: {best * 1e3:8.3f} ms   mean_dn "
              f"{float(np.mean(np.asarray(out.flux_dn))):.3f}", flush=True)


if __name__ == "__main__":
    main()
