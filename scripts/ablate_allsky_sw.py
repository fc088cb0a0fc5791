"""Ablation decomposition of the ALL-SKY SW megakernel's device time.

Patches the in-kernel cloud pieces out one at a time: the cloud-optics
LUT interp, the delta-scale/combine stage (its 6 divide chains), and the
general-g PIFM form. Timing only (wrong numbers by design). The round-5
trace showed the all-sky SW call is ~16.4 ms INSIDE the kernel at 28.8k
with only ~1.2 ms of XLA staging -- this attributes the in-kernel delta
over clear-sky (~4 ms) to its stages.

Usage: python scripts/ablate_allsky_sw.py [--ncol N] [--tile T]
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
    from rte_rrtmgp_nn_tpu.drivers.allsky import (
        _allsky_sw_core_mega,
        canonicalize_allsky_inputs,
        load_cloud_optics_checked,
        make_clouds,
        read_garand,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip import resolve_solar_source
    from rte_rrtmgp_nn_tpu.gasoptics.planck import sw_spectral_g112
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

    REF = "/root/reference"
    atm = read_garand(os.path.join(REF, "examples/all-sky/garand-atmos-1.nc"),
                      ncol)
    co = load_cloud_optics_checked(os.path.join(
        REF, "extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-sw.nc"))
    D = REF + "/neural/data/"
    models = [load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
              load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc")]
    spec = sw_spectral_g112()
    solar = jnp.asarray(resolve_solar_source(spec), jnp.float32)
    lwp, iwp, rel, rei = make_clouds(atm.play, atm.tlay, co)
    top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
    mu0 = jnp.full((ncol,), 0.86, jnp.float32)
    alb = jnp.full((ncol, spec.nband), 0.06, jnp.float32)

    fields, concs_t = canonicalize_allsky_inputs(
        atm.play, atm.plev, atm.tlay, atm.tlev, lwp, iwp, rel, rei,
        atm.gas_concs, top_at_1)
    play_t, plev_t, tlay_t, _, lwp_t, iwp_t, rel_t, rei_t = (
        jnp.asarray(a, jnp.float32) for a in fields)
    args = jax.device_put((play_t, plev_t, tlay_t, mu0, alb, alb,
                           lwp_t, iwp_t, rel_t, rei_t,
                           {k: jnp.asarray(v, jnp.float32)
                            for k, v in concs_t.items()}))
    print(f"ncol = {ncol}  tile = {tile_c}", flush=True)

    real_interp = SWM._cloud_lut_interp
    real_combine = SWM._cloud_combine
    real_pifm = SWM._pifm_coeffs

    def fake_interp(wp, re, t_hi, t_mid, t_lo, nsteps, nband, offset, step):
        z = wp * jnp.float32(1e-3)
        t = jnp.broadcast_to(z, (wp.shape[0], nband))
        return t, t * 0.5, t * 0.25

    def fake_combine(lt, lts, ltsg, it_, its, itsg, tau_gas, ssa_gas, oh,
                     eps):
        # consume the interp outputs + one dot (keeps DCE honest), skip
        # the 6 divide chains + the other two expansions
        tc = SWM._dot3split(lt + it_, oh)
        return tau_gas + tc, ssa_gas, ssa_gas * 0.5

    def pifm_g0(tau, ssa, g, mu0b, k_min, eps, general_g):
        # clear-sky specialization regardless of clouds: the delta is the
        # general-g gamma/alpha extra VPU work
        return real_pifm(tau, ssa, None, mu0b, k_min, eps, general_g=False)

    def pifm_fma(tau, ssa, g, mu0b, k_min, eps, general_g):
        # CANDIDATE (correct numerics up to regrouping): gammas as fma
        # chains on precomputed sg = ssa*g and mg = mu0*g instead of the
        # reference's nested products -- times whether the general-g
        # gamma algebra is worth restructuring
        import jax.numpy as jnp
        f32 = jnp.float32
        jnp_ = jnp
        sg = ssa * g
        mg = mu0b * g
        gamma1 = 2.0 - 1.25 * ssa - 0.75 * sg
        gamma2 = 0.75 * (ssa - sg)
        gamma3 = 0.5 - 0.75 * mg
        gamma4 = 0.5 + 0.75 * mg
        alpha1 = gamma1 * gamma4 + gamma2 * gamma3
        alpha2 = gamma1 * gamma3 + gamma2 * gamma4
        k = jnp_.sqrt(jnp_.maximum((gamma1 - gamma2) * (gamma1 + gamma2),
                                   k_min))
        mu0_inv = 1.0 / mu0b
        tnoscat = jnp_.exp(-tau * mu0_inv)
        e1 = jnp_.exp(-tau * k)
        e2 = e1 * e1
        k2e = 2.0 * k * e1
        k_mu = k * mu0b
        k_mu2 = k_mu * k_mu
        k_g3 = k * gamma3
        k_g4 = k * gamma4
        denom = jnp_.where(jnp_.abs(1.0 - k_mu2) >= eps, 1.0 - k_mu2, eps)
        rt_den = k * (1.0 + e2) + gamma1 * (1.0 - e2)
        inv = 1.0 / (rt_den * denom)
        rt_term = denom * inv
        rdif = rt_term * gamma2 * (1.0 - e2)
        tdif = rt_term * k2e
        rt2 = ssa * inv
        rdir = rt2 * ((1.0 - k_mu) * (alpha2 + k_g3)
                      - (1.0 + k_mu) * (alpha2 - k_g3) * e2
                      - k2e * (gamma3 - alpha2 * mu0b) * tnoscat)
        tdir = rt2 * (k2e * (gamma4 + alpha1 * mu0b)
                      - tnoscat * ((1.0 + k_mu) * (alpha1 + k_g4)
                                   - (1.0 - k_mu) * (alpha1 - k_g4) * e2))
        rdir = jnp_.clip(rdir, 0.0, 1.0 - tnoscat)
        tdir = jnp_.clip(tdir, 0.0, 1.0 - tnoscat - rdir)
        return rdif, tdif, rdir, tdir

    def timed():
        fn = jax.jit(functools.partial(
            _allsky_sw_core_mega, models, spec, solar, co,
            top_at_1=top_at_1, tile_c=tile_c))
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
    for name, interp, combine, pifm in [
        ("full", real_interp, real_combine, real_pifm),
        ("no-cloud-interp", fake_interp, real_combine, real_pifm),
        ("no-combine", real_interp, fake_combine, real_pifm),
        ("pifm-g0", real_interp, real_combine, pifm_g0),
        ("pifm-fma", real_interp, real_combine, pifm_fma),
        ("bare-cloud", fake_interp, fake_combine, pifm_g0),
    ]:
        SWM._cloud_lut_interp = interp
        SWM._cloud_combine = combine
        SWM._pifm_coeffs = pifm
        try:
            ms = timed()
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            ms = float("nan")
        finally:
            SWM._cloud_lut_interp = real_interp
            SWM._cloud_combine = real_combine
            SWM._pifm_coeffs = real_pifm
        variants.append((name, ms))
        print(f"{name:18s}: {ms:8.3f} ms", flush=True)
    base = dict(variants)["full"]
    for name, ms in variants[1:]:
        print(f"  {name} delta: {base - ms:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
