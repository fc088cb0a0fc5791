"""Ablation decomposition of the mega4 LW kernel's device time.

Monkeypatches pieces of ops/pallas/lw_megakernel OUT of the kernel (Planck
interpolation -> constant; sweep fori_loops -> skipped) and times each
variant on the chip. The deltas attribute the kernel's time to its phases
-- numerically WRONG outputs by construction, timing only.

Usage: python scripts/ablate_lw_mega.py [--mult N] [--tile T]
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

    import rte_rrtmgp_nn_tpu.ops.pallas.lw_megakernel as LWM
    from rte_rrtmgp_nn_tpu.drivers.rfmip import _lw_core_mega4
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.gasoptics.planck import PlanckTable, lw_spectral_g128
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    argv = sys.argv[1:]
    mult = 32
    if "--mult" in argv:
        i = argv.index("--mult")
        mult = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    tile = 32
    if "--tile" in argv:
        i = argv.index("--tile")
        tile = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]

    from _bench_util import guard_backend

    guard_backend()  # fail fast on a wedged tunnel (CLAUDE.md)
    data = read_rfmip(
        "/root/reference/examples/rfmip-clear-sky/"
        "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc")
    from _bench_util import replicate_rfmip

    data = replicate_rfmip(data, mult)
    ncol = data.ncol
    print(f"ncol = {ncol}  tile = {tile}", flush=True)
    models = [load_model_netcdf(
        "/root/reference/neural/data/lw-g128-210809_both_BEST.nc")]
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=jnp.float32)

    concs = {k: jnp.asarray(v, jnp.float32)
             for k, v in data.gas_concs.concs.items()}
    args = jax.device_put((
        jnp.asarray(data.play, jnp.float32),
        jnp.asarray(data.plev, jnp.float32),
        jnp.asarray(data.tlay, jnp.float32),
        jnp.asarray(data.tlev, jnp.float32),
        jnp.asarray(data.tsfc, jnp.float32),
        jnp.broadcast_to(
            jnp.asarray(data.sfc_emis, jnp.float32)[:, None],
            (ncol, spec.nband)),
        concs,
    ))

    real_interp = LWM._planck_interp_cat
    real_fact = LWM._source_fact
    real_fori = jax.lax.fori_loop
    f32 = jnp.float32

    def fake_interp(t_col, tp_cat, ntab, nband, t_min, t_delta):
        # constant Planck value: kills the one-hot build + the matmul
        return jnp.broadcast_to(
            jnp.float32(1.0), (t_col.shape[0], nband)) * t_col

    def interp_nobuild(t_col, tp_cat, ntab, nband, t_min, t_delta):
        # keep the (rows, ntab) x (ntab, 6*nband) MXU dot, replace the
        # one-hot BUILD (iota + trunc/clip + compare) with a cheap
        # data-dependent broadcast: the full-vs-this delta is the build
        val0 = (t_col - t_min) / t_delta
        frac = val0 - jnp.trunc(val0)
        oh0 = jnp.broadcast_to(t_col * jnp.float32(1e-3),
                               (t_col.shape[0], ntab))
        w = 2 * nband
        g3 = jnp.dot(oh0, tp_cat[:, :], preferred_element_type=f32)
        g = (g3[:, :w] + g3[:, w:2 * w]) + g3[:, 2 * w:]
        return g[:, :nband] + frac * g[:, nband:]

    def interp_nodot(t_col, tp_cat, ntab, nband, t_min, t_delta):
        # keep the one-hot build, replace the MXU dot with a cross-lane
        # sum (consumes oh0 so nothing folds away): delta = the dot
        val0 = (t_col - t_min) / t_delta
        tr = jnp.trunc(val0)
        i0 = jnp.clip(tr, 0.0, float(ntab - 2))
        frac = val0 - tr
        k = jax.lax.broadcasted_iota(
            jnp.int32, (t_col.shape[0], ntab), 1).astype(f32)
        oh0 = (k == i0).astype(f32)
        g = jnp.broadcast_to(jnp.sum(oh0, axis=1, keepdims=True),
                             (t_col.shape[0], 2 * nband))
        return g[:, :nband] + frac * g[:, nband:]

    def fact_recip(tl, trans, tau_thresh):
        # reciprocal-then-multiply instead of the divide (<=1 ulp regroup)
        tl_safe = jnp.where(tl > tau_thresh, tl, 1.0)
        r = 1.0 / tl_safe
        return jnp.where(tl > tau_thresh, (1.0 - trans) * r - trans,
                         tl * (0.5 - (1.0 / 3.0) * tl))

    def fact_nodiv(tl, trans, tau_thresh):
        # no divide at all (WRONG values): the full-vs-this delta is the
        # divide's cost
        return jnp.where(tl > tau_thresh, (1.0 - trans) * 0.5 - trans,
                         tl * (0.5 - (1.0 / 3.0) * tl))

    def fake_fori(lo, hi, body, init, unroll=None):
        return init  # skip the sweep loops entirely

    def timed():
        fn = jax.jit(functools.partial(
            _lw_core_mega4, models, table, spec, top_at_1=data.top_at_1,
            tile_c=tile))
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        return best * 1e3

    variants = []
    for name, interp, fact, fori in [
        ("full", real_interp, real_fact, real_fori),
        ("no-interp", fake_interp, real_fact, real_fori),
        ("interp-no-build", interp_nobuild, real_fact, real_fori),
        ("interp-no-dot", interp_nodot, real_fact, real_fori),
        ("fact-recip", fact_recip, None, real_fori),  # None = swap fact
        ("fact-no-divide", fact_nodiv, None, real_fori),
        ("no-sweeps", real_interp, real_fact, fake_fori),
        ("no-interp-no-sweeps", fake_interp, real_fact, fake_fori),
    ]:
        if fact is None:   # the fact variants ride the interp slot
            fact, interp = interp, real_interp
        LWM._planck_interp_cat = interp
        LWM._source_fact = fact
        jax.lax.fori_loop = fori
        try:
            ms = timed()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            ms = float("nan")
        finally:
            LWM._planck_interp_cat = real_interp
            LWM._source_fact = real_fact
            jax.lax.fori_loop = real_fori
        variants.append((name, ms))
        print(f"{name:24s}: {ms:8.3f} ms", flush=True)
    base = dict(variants)["full"]
    for name, ms in variants[1:]:
        print(f"  {name} delta: {base - ms:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
