"""All-sky (cloudy) TPU throughput benchmark: Garand atmospheres + NN gas
optics + cloud optics LUT + McICA-free overcast clouds, LW + SW.

The all-sky analogue of bench.py's clear-sky headline (the reference
prints per-column all-sky timing, rrtmgp_allsky.F90:469-475). Times the
jitted lay-major cores on device-resident inputs, best-of-3 x 20 iters.

Usage: python scripts/bench_allsky.py [--ncol N]   (default 1800)
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Persistent XLA compile cache (see bench.py): tunnel compiles are slow.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from bench import (  # noqa: E402  (tunnel-wedge guard + slope timer)
    ensure_live_backend,
    timed_resident_slope,
)

REF = "/root/reference"
GARAND = os.path.join(REF, "examples/all-sky/garand-atmos-1.nc")
LW_COEFFS = os.path.join(
    REF, "extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-lw.nc")
SW_COEFFS = os.path.join(
    REF, "extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-sw.nc")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=1800)
    ap.add_argument("--core", choices=["auto", "mega", "staged"],
                    default="auto",
                    help="auto = megakernel cores on TPU, staged elsewhere")
    args = ap.parse_args()

    ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_nn_tpu.drivers.allsky import (
        _allsky_lw_core_lay_major,
        _allsky_lw_core_mega,
        _allsky_sw_core_lay_major,
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

    dtype = jnp.float32
    ncol = args.ncol
    D = os.path.join(REF, "neural/data/")
    lw_models = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
    sw_models = [
        load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
        load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc"),
    ]
    lw_spec = lw_spectral_g128()
    sw_spec = sw_spectral_g112()
    table = PlanckTable.compute(lw_spec.band_lims_wvn_array, dtype=dtype)
    solar = jnp.asarray(resolve_solar_source(sw_spec), dtype)

    atm = read_garand(GARAND, ncol)
    co_lw = load_cloud_optics_checked(LW_COEFFS)
    co_sw = load_cloud_optics_checked(SW_COEFFS)
    lwp, iwp, rel, rei = make_clouds(atm.play, atm.tlay, co_lw)
    top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
    sfc_lev = -1 if top_at_1 else 0

    from rte_rrtmgp_nn_tpu.drivers.allsky import ALLSKY_LW_MEGA_MIN_NCOL

    on_tpu = jax.default_backend() == "tpu"
    # auto mirrors the driver dispatch: regime-aware LW (staged below the
    # measured crossover), megakernel SW everywhere on TPU
    use_mega_lw = (on_tpu and ncol >= ALLSKY_LW_MEGA_MIN_NCOL
                   if args.core == "auto" else args.core == "mega")
    use_mega_sw = on_tpu if args.core == "auto" else args.core == "mega"
    use_mega = use_mega_lw or use_mega_sw

    tsfc = jnp.asarray(atm.tlev[:, sfc_lev], dtype)
    emis = jnp.full((ncol, lw_spec.nband), 0.98, dtype)
    alb = jnp.full((ncol, sw_spec.nband), 0.06, dtype)
    mu0 = jnp.full((ncol,), 0.86, dtype)
    if use_mega:  # canonical lay-major inputs (layout work stays host-side)
        fields, concs_t = canonicalize_allsky_inputs(
            atm.play, atm.plev, atm.tlay, atm.tlev, lwp, iwp, rel, rei,
            atm.gas_concs, top_at_1)
        play_t, plev_t, tlay_t, tlev_t, lwp_t, iwp_t, rel_t, rei_t = (
            jnp.asarray(a, dtype) for a in fields)
        concs = {k: jnp.asarray(v, dtype) for k, v in concs_t.items()}
        lw_args = jax.device_put((
            play_t, plev_t, tlay_t, tlev_t, tsfc, emis,
            lwp_t, iwp_t, rel_t, rei_t, concs))
        sw_args = jax.device_put((
            play_t, plev_t, tlay_t, mu0, alb, alb,
            lwp_t, iwp_t, rel_t, rei_t, concs))
    else:
        concs = {k: jnp.asarray(v, dtype)
                 for k, v in atm.gas_concs.concs.items()}
        cloud_args = tuple(jnp.asarray(a, dtype) for a in (lwp, iwp, rel, rei))
        lw_args = jax.device_put((
            jnp.asarray(atm.play, dtype), jnp.asarray(atm.plev, dtype),
            jnp.asarray(atm.tlay, dtype), jnp.asarray(atm.tlev, dtype),
            tsfc, emis, *cloud_args, concs,
        ))
        sw_args = jax.device_put((
            jnp.asarray(atm.play, dtype), jnp.asarray(atm.plev, dtype),
            jnp.asarray(atm.tlay, dtype), mu0,
            alb, alb, *cloud_args, concs,
        ))
    if use_mega and not use_mega_lw:
        # staged LW args in the regime-aware auto mode
        concs_s = {k: jnp.asarray(v, dtype)
                   for k, v in atm.gas_concs.concs.items()}
        lw_args = jax.device_put((
            jnp.asarray(atm.play, dtype), jnp.asarray(atm.plev, dtype),
            jnp.asarray(atm.tlay, dtype), jnp.asarray(atm.tlev, dtype),
            tsfc, emis,
            *(jnp.asarray(a, dtype) for a in (lwp, iwp, rel, rei)),
            concs_s,
        ))
    lw_core = (_allsky_lw_core_mega if use_mega_lw
               else _allsky_lw_core_lay_major)
    sw_core = (_allsky_sw_core_mega if use_mega_sw
               else _allsky_sw_core_lay_major)
    lw_fn = jax.jit(functools.partial(
        lw_core, lw_models, table, lw_spec, co_lw, top_at_1=top_at_1))
    sw_fn = jax.jit(functools.partial(
        sw_core, sw_models, sw_spec, solar, co_sw, top_at_1=top_at_1))

    flw = lw_fn(*lw_args)
    fsw = sw_fn(*sw_args)
    jax.block_until_ready((flw, fsw))

    def timed(fn, a, n_iter=20, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n_iter)
        return best

    t_lw_percall = timed(lw_fn, lw_args)
    t_sw_percall = timed(sw_fn, sw_args)
    if jax.default_backend() == "tpu":
        # Headline = device-resident fori_loop slope (see bench.py): the
        # tunnel's fixed ~26 ms dispatch cost otherwise pollutes every
        # per-call number by ~1.3 ms at 20 iters.
        t_lw = timed_resident_slope(lw_fn, lw_args)
        t_sw = timed_resident_slope(sw_fn, sw_args)
        timing = "device-resident fori_loop slope K=50..450"
    else:
        t_lw, t_sw = t_lw_percall, t_sw_percall
        timing = "20-iter enqueue (cpu)"
    result = {
        "metric": "allsky_lw_sw_columns_per_s_per_chip",
        "value": round(ncol / (t_lw + t_sw), 1),
        "unit": "columns/s",
        "ncol": ncol,
        "core": ("mega" if use_mega_lw else "staged") + "+" +
                ("mega" if use_mega_sw else "staged"),
        "lw_ms": round(t_lw * 1e3, 3),
        "sw_ms": round(t_sw * 1e3, 3),
        "lw_ms_percall": round(t_lw_percall * 1e3, 3),
        "sw_ms_percall": round(t_sw_percall * 1e3, 3),
        "timing": timing,
        "lw_mean_dn": round(float(np.mean(np.asarray(flw.flux_dn))), 3),
        "lw_mean_up": round(float(np.mean(np.asarray(flw.flux_up))), 3),
        "sw_mean_dn": round(float(np.mean(np.asarray(fsw.flux_dn))), 3),
        "sw_mean_up": round(float(np.mean(np.asarray(fsw.flux_up))), 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
