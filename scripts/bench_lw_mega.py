"""Benchmark the fused LW megakernel core against the staged lay-major core
on the current backend (run on the TPU tunnel; see docs/PERFORMANCE.md).

Usage: python scripts/bench_lw_mega.py [--mult N] [--variants a,b,..] [tile_c ...]
(default tiles: 32; --mult replicates the 1800-col RFMIP batch;
variants: staged presrc prep mega4 -- default staged,prep,mega4)

Prints per-variant ms/batch plus a flux parity check vs the staged core.
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
        _lw_core_lay_major,
        _lw_core_mega4,
        _lw_core_prep,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.gasoptics.planck import PlanckTable, lw_spectral_g128
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    argv = sys.argv[1:]
    mult = 1
    if "--mult" in argv:
        i = argv.index("--mult")
        mult = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    variants = ["staged", "prep", "mega4"]
    if "--variants" in argv:
        i = argv.index("--variants")
        variants = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2:]
    if "--skip-mega" in argv:  # legacy flag: drop ALL mega* variants
        argv = [a for a in argv if a != "--skip-mega"]
        variants = [v for v in variants if not v.startswith("mega")]
    tiles = [int(a) for a in argv] or [32]
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
    models = [load_model_netcdf(
        "/root/reference/neural/data/lw-g128-210809_both_BEST.nc")]
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=dtype)

    concs = {k: jnp.asarray(v, dtype) for k, v in data.gas_concs.concs.items()}
    args = (
        jnp.asarray(data.play, dtype), jnp.asarray(data.plev, dtype),
        jnp.asarray(data.tlay, dtype), jnp.asarray(data.tlev, dtype),
        jnp.asarray(data.tsfc, dtype),
        jnp.broadcast_to(
            jnp.asarray(data.sfc_emis, dtype)[:, None], (ncol, spec.nband)),
        concs,
    )
    args = jax.device_put(args)

    def timed(fn, n_iter=20, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n_iter)
        return best, out

    staged = jax.jit(functools.partial(
        _lw_core_lay_major, models, table, spec, top_at_1=data.top_at_1,
        solver_variant="fused"))
    t_staged, ref = timed(staged)
    print(f"staged lay-major (fused): {t_staged*1e3:8.3f} ms  "
          f"mean_dn={float(np.mean(np.asarray(ref.flux_dn))):.4f}", flush=True)

    if "presrc" in variants:
        presrc = jax.jit(functools.partial(
            _lw_core_lay_major, models, table, spec, top_at_1=data.top_at_1,
            solver_variant="presrc"))
        t_p, out_p = timed(presrc)
        err = float(np.max(np.abs(
            np.asarray(out_p.flux_dn) - np.asarray(ref.flux_dn))))
        print(f"staged lay-major (presrc): {t_p*1e3:8.3f} ms  "
              f"max|d_dn|={err:.2e}", flush=True)

    from rte_rrtmgp_nn_tpu.drivers.rfmip import _lw_core_mega5

    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        _lw_core_mega4_canon,
        canonicalize_rfmip_inputs,
    )

    def _mega4_stored(models, table, spec, play, plev, tlay, tlev, tsfc,
                      emis, concs, top_at_1, tile_c):
        # canon front + stored-sweep kernel (host canonicalization happens
        # in-jit here; fine for an A/B of the kernel itself)
        canon = (lambda a: a.T) if top_at_1 else (lambda a: a[:, ::-1].T)
        concs_t = {g: canon(v) if getattr(v, "ndim", 0) == 2 else v
                   for g, v in concs.items()}
        return _lw_core_mega4_canon(
            models, table, spec, canon(play), canon(plev), canon(tlay),
            canon(tlev), tsfc, emis, concs_t,
            top_at_1=top_at_1, tile_c=tile_c, sweep_stored=True)

    cores = {"prep": _lw_core_prep, "mega4": _lw_core_mega4,
             "mega4s": _mega4_stored,
             "mega5": _lw_core_mega5,
             "mega6": functools.partial(_lw_core_mega5, mxu_first=True)}
    for name in variants:
        if name in ("staged", "presrc"):
            continue
        core = cores[name]
        for tc in tiles:
            fn = jax.jit(functools.partial(
                core, models, table, spec, top_at_1=data.top_at_1, tile_c=tc))
            try:
                t_v, out = timed(fn)
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
