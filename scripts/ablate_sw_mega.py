"""Ablation decomposition of the SW megakernel's device time.

Monkeypatches pieces of ops/pallas/sw_megakernel OUT (the two MLPs ->
constant tau; the three sweep fori_loops -> skipped) and times each
variant on the chip. Numerically WRONG by construction -- timing only.

Usage: python scripts/ablate_sw_mega.py [--mult N] [--tile T]
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

    import rte_rrtmgp_nn_tpu.ops.pallas.sw_megakernel as SWM
    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        _sw_core_mega,
        resolve_solar_source,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.gasoptics.planck import sw_spectral_g112
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

    data = read_rfmip(
        "/root/reference/examples/rfmip-clear-sky/"
        "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc")
    if mult > 1:
        import dataclasses
        rep = lambda a: np.concatenate([a] * mult, axis=0)
        data = dataclasses.replace(
            data, play=rep(data.play), plev=rep(data.plev),
            tlay=rep(data.tlay), tlev=rep(data.tlev), tsfc=rep(data.tsfc),
            sfc_emis=rep(data.sfc_emis), sfc_alb=rep(data.sfc_alb),
            sza=rep(data.sza), tsi=rep(data.tsi),
            gas_concs=type(data.gas_concs)({
                k: (rep(v) if getattr(v, "ndim", 0) == 2 else v)
                for k, v in data.gas_concs.concs.items()}),
            nexp=data.nexp * mult)
    ncol = data.ncol
    print(f"ncol = {ncol}  tile = {tile}", flush=True)
    D = "/root/reference/neural/data/"
    models = [load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
              load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc")]
    spec = sw_spectral_g112()
    solar = jnp.asarray(resolve_solar_source(spec), jnp.float32)

    mu0 = np.cos(np.deg2rad(data.sza))
    usecol = data.sza < 90.0 - 0.5 * np.finfo(np.float32).eps
    args = jax.device_put((
        jnp.asarray(data.play, jnp.float32),
        jnp.asarray(data.plev, jnp.float32),
        jnp.asarray(data.tlay, jnp.float32),
        jnp.asarray(data.sfc_alb, jnp.float32),
        jnp.asarray(mu0, jnp.float32), jnp.asarray(usecol),
        jnp.asarray(data.tsi, jnp.float32),
        {k: jnp.asarray(v, jnp.float32)
         for k, v in data.gas_concs.concs.items()},
    ))

    real_mlp = SWM._mlp_tau
    real_fori = jax.lax.fori_loop

    def fake_mlp(ff, nf, w1, b1, w2, b2, w3, b3, omean, ostd, col_dry):
        # constant spectral tau, kills both nets
        return jnp.broadcast_to(col_dry * jnp.float32(1e-3),
                                (ff.shape[0], omean.shape[1]))

    def fake_fori(lo, hi, body, init, unroll=None):
        return init

    def timed():
        fn = jax.jit(functools.partial(
            _sw_core_mega, models, spec, solar, top_at_1=data.top_at_1,
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
    for name, mlp, fori in [
        ("full", real_mlp, real_fori),
        ("no-mlp", fake_mlp, real_fori),
        ("no-sweeps", real_mlp, fake_fori),
        ("no-mlp-no-sweeps", fake_mlp, fake_fori),
    ]:
        SWM._mlp_tau = mlp
        jax.lax.fori_loop = fori
        try:
            ms = timed()
        finally:
            SWM._mlp_tau = real_mlp
            jax.lax.fori_loop = real_fori
        variants.append((name, ms))
        print(f"{name:24s}: {ms:8.3f} ms", flush=True)
    base = dict(variants)["full"]
    for name, ms in variants[1:]:
        print(f"  {name} delta: {base - ms:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
