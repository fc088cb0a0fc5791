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

    from _bench_util import guard_backend

    guard_backend()  # fail fast on a wedged tunnel (CLAUDE.md)
    data = read_rfmip(
        "/root/reference/examples/rfmip-clear-sky/"
        "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc")
    from _bench_util import replicate_rfmip

    data = replicate_rfmip(data, mult)
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

    real = {n: getattr(SWM, n) for n in (
        "_mlp_tau2", "_pifm_coeffs", "_phase_direct", "_phase_albedo",
        "_phase_flux")}

    def fake_mlp(ff, n2d, w1, b1, w2, b2, w3, b3, omean, ostd, col_dry,
                 hc_rows):
        # constant spectral tau, kills both (merged) nets
        ngpt = omean.shape[1] // 2
        t = jnp.broadcast_to(col_dry * jnp.float32(1e-3),
                             (ff.shape[0], ngpt))
        return t, t

    def fake_pifm(tau, ssa, g, mu0b, k_min, eps, general_g):
        # no exp/sqrt/div: four cheap products with the right shapes
        z = tau * jnp.float32(0.25)
        return z, z * 0.5, z * 0.25, z * 0.125

    def fake_direct(nlay, tile_c, ngpt, unroll, sweep_stored,
                    inc_dir, s_a, s_b, s_c, dir_acc):
        return inc_dir

    def fake_albedo(nlay, unroll, alb_sfc, src_sfc, s_rdif, s_tdif, s_a,
                    s_b, s_c, s_d):
        return alb_sfc, src_sfc

    def fake_flux(nlay, unroll, sweep_stored, inc_dif,
                  s_rdif, s_tdif, s_a, s_b, s_c, s_d, dn_acc, up_acc):
        return None

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
    for name, patches in [
        ("full", {}),
        ("no-mlp", {"_mlp_tau2": fake_mlp}),
        ("no-pifm", {"_pifm_coeffs": fake_pifm}),
        ("no-direct", {"_phase_direct": fake_direct}),
        ("no-albedo", {"_phase_albedo": fake_albedo}),
        ("no-flux", {"_phase_flux": fake_flux}),
        ("no-sweeps", {"_phase_direct": fake_direct,
                       "_phase_albedo": fake_albedo,
                       "_phase_flux": fake_flux}),
        ("bare", {"_mlp_tau2": fake_mlp, "_pifm_coeffs": fake_pifm,
                  "_phase_direct": fake_direct,
                  "_phase_albedo": fake_albedo, "_phase_flux": fake_flux}),
    ]:
        for n, f in patches.items():
            setattr(SWM, n, f)
        try:
            ms = timed()
        except Exception as e:  # keep sweeping (sibling ablation scripts):
            # one VMEM-OOM variant must not discard the session's rest
            print(f"{name:24s}: FAILED ({e})", flush=True)
            continue
        finally:
            for n in patches:
                setattr(SWM, n, real[n])
        variants.append((name, ms))
        print(f"{name:24s}: {ms:8.3f} ms", flush=True)
    base = dict(variants)["full"]
    for name, ms in variants[1:]:
        print(f"  {name} delta: {base - ms:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
