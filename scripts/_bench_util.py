"""Shared setup/timing helpers for the all-sky chip measurement scripts
(trace_allsky_sw.py, ablate_allsky_sw.py, probe_allsky_sw_tile.py).

Keeps the Garand + cloud-optics + canonicalization staging and the
CLAUDE.md-mandated timing protocol (enqueue >= 20 iters, block once,
best of 3) in ONE place.
"""
from __future__ import annotations

import functools
import os
import time

REF = "/root/reference"
GARAND = os.path.join(REF, "examples/all-sky/garand-atmos-1.nc")
NN_DIR = os.path.join(REF, "neural/data/")


def allsky_mega_setup(ncol: int, band: str = "sw", tile_c: int = 32):
    """Stage one all-sky megakernel-core call: returns (fn, args) where
    ``fn`` is the jitted ``_allsky_{band}_core_mega`` partial and ``args``
    are device-put canonical lay-major inputs (host-side
    canonicalize_allsky_inputs, reference rrtmgp_allsky.F90 config)."""
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_nn_tpu.drivers.allsky import (
        _allsky_lw_core_mega,
        _allsky_sw_core_mega,
        canonicalize_allsky_inputs,
        load_cloud_optics_checked,
        make_clouds,
        read_garand,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip import resolve_solar_source
    from rte_rrtmgp_nn_tpu.gasoptics.planck import (
        PlanckTable,
        lw_spectral_g128,
        sw_spectral_g112,
    )
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    dtype = jnp.float32
    atm = read_garand(GARAND, ncol)
    top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
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
        models = [load_model_netcdf(NN_DIR + "sw-g112-210809_absorption_BEST.nc"),
                  load_model_netcdf(NN_DIR + "sw-g112-210809_rayleigh_BEST.nc")]
        spec = sw_spectral_g112()
        solar = jnp.asarray(resolve_solar_source(spec), dtype)
        mu0 = jnp.full((ncol,), 0.86, dtype)
        alb = jnp.full((ncol, spec.nband), 0.06, dtype)
        args = jax.device_put((play_t, plev_t, tlay_t, mu0, alb, alb,
                               lwp_t, iwp_t, rel_t, rei_t, concs))
        fn = jax.jit(functools.partial(
            _allsky_sw_core_mega, models, spec, solar, co,
            top_at_1=top_at_1, tile_c=tile_c))
    elif band == "lw":
        models = [load_model_netcdf(NN_DIR + "lw-g128-210809_both_BEST.nc")]
        spec = lw_spectral_g128()
        table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=dtype)
        sfc_lev = -1 if top_at_1 else 0
        tsfc = jnp.asarray(atm.tlev[:, sfc_lev], dtype)
        emis = jnp.full((ncol, spec.nband), 0.98, dtype)
        args = jax.device_put((play_t, plev_t, tlay_t, tlev_t, tsfc, emis,
                               lwp_t, iwp_t, rel_t, rei_t, concs))
        fn = jax.jit(functools.partial(
            _allsky_lw_core_mega, models, table, spec, co,
            top_at_1=top_at_1, tile_c=tile_c))
    else:
        raise ValueError(f"band must be 'lw' or 'sw', got {band!r}")
    return fn, args


def timed_best(fn, args, n_iter: int = 20, reps: int = 3) -> float:
    """Best-of-``reps`` mean ms/call, enqueueing ``n_iter`` calls and
    blocking ONCE (per-call block_until_ready is erratic on the tunnel,
    docs/PERFORMANCE.md measurement methodology). Compiles outside the
    timer."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best * 1e3
