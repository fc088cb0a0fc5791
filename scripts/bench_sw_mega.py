"""Benchmark the fused SW megakernel core against the staged lay-major core
on the current backend (run on the TPU tunnel; see docs/PERFORMANCE.md).

Usage: python scripts/bench_sw_mega.py [--mult N] [tile_c ...]
(default tiles: 32 64; --mult replicates the 1800-col RFMIP batch)
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        _sw_core_lay_major,
        _sw_core_mega,
        _sw_core_mega_canon,
        canonicalize_rfmip_inputs,
        resolve_solar_source,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.gasoptics.planck import sw_spectral_g112
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    argv = sys.argv[1:]
    mult = 1
    if "--mult" in argv:
        i = argv.index("--mult")
        mult = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    canon = "--canon" in argv
    if canon:
        argv.remove("--canon")
    tiles = [int(a) for a in argv] or [32, 64]
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
    print(f"ncol = {ncol}", flush=True)
    models = [
        load_model_netcdf(
            "/root/reference/neural/data/sw-g112-210809_absorption_BEST.nc"),
        load_model_netcdf(
            "/root/reference/neural/data/sw-g112-210809_rayleigh_BEST.nc"),
    ]
    spec = sw_spectral_g112()
    solar = jnp.asarray(resolve_solar_source(spec), dtype)

    mu0 = np.cos(np.deg2rad(data.sza))
    usecol = data.sza < 90.0 - 0.5 * np.finfo(np.float32).eps
    concs = {k: jnp.asarray(v, dtype) for k, v in data.gas_concs.concs.items()}
    args = (
        jnp.asarray(data.play, dtype), jnp.asarray(data.plev, dtype),
        jnp.asarray(data.tlay, dtype), jnp.asarray(data.sfc_alb, dtype),
        jnp.asarray(mu0, dtype), jnp.asarray(usecol),
        jnp.asarray(data.tsi, dtype), concs,
    )
    args = jax.device_put(args)
    if canon:
        # production path: host-side canonical lay-major inputs
        play_t, plev_t, tlay_t, _, concs_t = canonicalize_rfmip_inputs(data)
        margs = jax.device_put((
            jnp.asarray(play_t, dtype), jnp.asarray(plev_t, dtype),
            jnp.asarray(tlay_t, dtype), jnp.asarray(data.sfc_alb, dtype),
            jnp.asarray(mu0, dtype), jnp.asarray(usecol),
            jnp.asarray(data.tsi, dtype),
            {k: jnp.asarray(v, dtype) for k, v in concs_t.items()},
        ))
        mega_core = _sw_core_mega_canon
    else:
        margs = args
        mega_core = _sw_core_mega

    def timed(fn, margs=args, n_iter=20, reps=3):
        out = fn(*margs)
        jax.block_until_ready(out)  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = fn(*margs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n_iter)
        return best, out

    staged = jax.jit(functools.partial(
        _sw_core_lay_major, models, spec, solar, top_at_1=data.top_at_1))
    t_staged, ref = timed(staged)
    print(f"staged lay-major: {t_staged*1e3:8.3f} ms  "
          f"mean_dn={float(np.mean(np.asarray(ref.flux_dn))):.4f} "
          f"mean_up={float(np.mean(np.asarray(ref.flux_up))):.4f}", flush=True)

    for tc in tiles:
        for stored in (False, True):
            fn = jax.jit(functools.partial(
                mega_core, models, spec, solar, top_at_1=data.top_at_1,
                tile_c=tc, sweep_stored=stored))
            name = "megas" if stored else "mega"
            try:
                t_v, out = timed(fn, margs)
                err_up = float(np.max(np.abs(
                    np.asarray(out.flux_up) - np.asarray(ref.flux_up))))
                err_dn = float(np.max(np.abs(
                    np.asarray(out.flux_dn) - np.asarray(ref.flux_dn))))
                print(f"{name} tile_c={tc:4d}: {t_v*1e3:8.3f} ms  "
                      f"max|d_up|={err_up:.2e} max|d_dn|={err_dn:.2e}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} tile_c={tc:4d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
