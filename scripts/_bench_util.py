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


def guard_backend(require_tpu: bool = False) -> str:
    """Fail fast on a wedged tunnel BEFORE the first in-process device op
    (which would hang unkillably; CLAUDE.md tunnel-wedge note) by running
    bench.py's subprocess probe. Returns the backend tag; with
    require_tpu=True, exits instead of silently measuring on the CPU
    fallback."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import ensure_live_backend

    tag = ensure_live_backend()
    if require_tpu and tag == "tpu-unreachable":
        raise SystemExit("TPU tunnel unreachable (probe timed out); "
                         "refusing to measure on the CPU fallback")
    return tag


def allsky_mega_setup(ncol: int, band: str = "sw", tile_c: int = 32):
    """Stage one all-sky megakernel-core call: returns (fn, args) where
    ``fn`` is the jitted ``_allsky_{band}_core_mega`` partial and ``args``
    are device-put canonical lay-major inputs (host-side
    canonicalize_allsky_inputs, reference rrtmgp_allsky.F90 config)."""
    ctx, args = allsky_mega_stage(ncol, band)
    return allsky_mega_fn(ctx, tile_c), args


def allsky_mega_stage(ncol: int, band: str = "sw"):
    """The staging half of allsky_mega_setup (Garand read, model/cloud
    loads, canonicalization, device_put) -- do it ONCE and build per-
    variant/per-tile jitted fns with allsky_mega_fn: the args never
    change, and every redundant re-stage repays device_put through the
    ~40-46 MB/s tunnel wire."""
    guard_backend()  # fail fast on a wedged tunnel, before any device op

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
        ctx = {"band": band, "core": _allsky_sw_core_mega,
               "partial_args": (models, spec, solar, co),
               "top_at_1": top_at_1}
    elif band == "lw":
        models = [load_model_netcdf(NN_DIR + "lw-g128-210809_both_BEST.nc")]
        spec = lw_spectral_g128()
        table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=dtype)
        sfc_lev = -1 if top_at_1 else 0
        tsfc = jnp.asarray(atm.tlev[:, sfc_lev], dtype)
        emis = jnp.full((ncol, spec.nband), 0.98, dtype)
        args = jax.device_put((play_t, plev_t, tlay_t, tlev_t, tsfc, emis,
                               lwp_t, iwp_t, rel_t, rei_t, concs))
        ctx = {"band": band, "core": _allsky_lw_core_mega,
               "partial_args": (models, table, spec, co),
               "top_at_1": top_at_1}
    else:
        raise ValueError(f"band must be 'lw' or 'sw', got {band!r}")
    return ctx, args


def allsky_mega_fn(ctx, tile_c: int = 32):
    """Build the jitted all-sky mega core for a staged ctx. Re-calling
    after a monkeypatch (or with a new tile) retraces and picks up the
    patched kernel helpers without re-staging the inputs."""
    import jax

    return jax.jit(functools.partial(
        ctx["core"], *ctx["partial_args"],
        top_at_1=ctx["top_at_1"], tile_c=tile_c))


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


def replicate_rfmip(data, mult: int):
    """Replicate an RFMIP batch ``mult``x along columns: the shared
    --mult staging of the bench/ablate/trace/probe scripts (one copy of
    the dataclasses.replace blob instead of seven)."""
    if mult <= 1:
        return data
    import dataclasses

    import numpy as np

    rep = lambda a: np.concatenate([a] * mult, axis=0)
    return dataclasses.replace(
        data, play=rep(data.play), plev=rep(data.plev),
        tlay=rep(data.tlay), tlev=rep(data.tlev), tsfc=rep(data.tsfc),
        sfc_emis=rep(data.sfc_emis), sfc_alb=rep(data.sfc_alb),
        sza=rep(data.sza), tsi=rep(data.tsi),
        gas_concs=type(data.gas_concs)({
            k: (rep(v) if getattr(v, "ndim", 0) == 2 else v)
            for k, v in data.gas_concs.concs.items()}),
        nexp=data.nexp * mult)
