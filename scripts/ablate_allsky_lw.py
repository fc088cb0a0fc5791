"""Ablation decomposition of the ALL-SKY LW megakernel's device time.

Patches the in-kernel cloud-optics LUT interp, the Planck interp, and the
sweep loops out one at a time. Timing only (wrong numbers by design).

Usage: python scripts/ablate_allsky_lw.py [--ncol N] [--tile T]
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
    from rte_rrtmgp_nn_tpu.drivers.allsky import (
        _allsky_lw_core_mega,
        canonicalize_allsky_inputs,
        load_cloud_optics_checked,
        make_clouds,
        read_garand,
    )
    from rte_rrtmgp_nn_tpu.gasoptics.planck import PlanckTable, lw_spectral_g128
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    argv = sys.argv[1:]
    ncol = 28800
    tile_c = 32
    if "--ncol" in argv:
        i = argv.index("--ncol")
        ncol = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--tile" in argv:
        i = argv.index("--tile")
        tile_c = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if argv:
        raise SystemExit(f"unrecognized arguments: {argv}")

    from _bench_util import guard_backend

    guard_backend()  # fail fast on a wedged tunnel (CLAUDE.md)

    REF = "/root/reference"
    atm = read_garand(os.path.join(REF, "examples/all-sky/garand-atmos-1.nc"),
                      ncol)
    co = load_cloud_optics_checked(os.path.join(
        REF, "extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-lw.nc"))
    models = [load_model_netcdf(
        REF + "/neural/data/lw-g128-210809_both_BEST.nc")]
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=jnp.float32)
    lwp, iwp, rel, rei = make_clouds(atm.play, atm.tlay, co)
    top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
    tsfc = atm.tlev[:, -1 if top_at_1 else 0]
    emis = jnp.full((ncol, spec.nband), 0.98, jnp.float32)

    fields, concs_t = canonicalize_allsky_inputs(
        atm.play, atm.plev, atm.tlay, atm.tlev, lwp, iwp, rel, rei,
        atm.gas_concs, top_at_1)
    args = jax.device_put((
        *(jnp.asarray(a, jnp.float32) for a in fields),
        jnp.asarray(tsfc, jnp.float32), emis,
    ))
    concs_d = jax.device_put(
        {k: jnp.asarray(v, jnp.float32) for k, v in concs_t.items()})
    print(f"ncol = {ncol}", flush=True)

    real_cloud = LWM._cloud_lut_interp
    real_interp = LWM._planck_interp_cat
    real_fori = jax.lax.fori_loop

    def fake_cloud(wp, re, t_hi, t_mid, t_lo, nsteps, nband, offset, step):
        z = wp * jnp.float32(1e-3)
        t = jnp.broadcast_to(z, (wp.shape[0], nband))
        return t, t * 0.5, t * 0.25

    def fake_interp(t_col, tp_cat, ntab, nband, t_min, t_delta):
        return jnp.broadcast_to(t_col, (t_col.shape[0], nband))

    def fake_fori(lo, hi, body, init, unroll=None):
        return init

    def timed():
        play_t, plev_t, tlay_t, tlev_t, lwp_t, iwp_t, rel_t, rei_t, ts, em = args
        fn = jax.jit(functools.partial(
            _allsky_lw_core_mega, models, table, spec, co,
            top_at_1=top_at_1, tile_c=tile_c))
        fargs = (play_t, plev_t, tlay_t, tlev_t, ts, em,
                 lwp_t, iwp_t, rel_t, rei_t, concs_d)
        out = fn(*fargs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(*fargs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        return best * 1e3

    variants = []
    for name, cloud, interp, fori in [
        ("full", real_cloud, real_interp, real_fori),
        ("no-cloud-lut", fake_cloud, real_interp, real_fori),
        ("no-planck", real_cloud, fake_interp, real_fori),
        ("no-sweeps", real_cloud, real_interp, fake_fori),
        ("bare", fake_cloud, fake_interp, fake_fori),
    ]:
        LWM._cloud_lut_interp = cloud
        LWM._planck_interp_cat = interp
        jax.lax.fori_loop = fori
        try:
            ms = timed()
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            ms = float("nan")
        finally:
            LWM._cloud_lut_interp = real_cloud
            LWM._planck_interp_cat = real_interp
            jax.lax.fori_loop = real_fori
        variants.append((name, ms))
        print(f"{name:16s}: {ms:8.3f} ms", flush=True)
    base = dict(variants)["full"]
    for name, ms in variants[1:]:
        print(f"  {name} delta: {base - ms:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
