"""Ablation decomposition of the ALL-SKY SW megakernel's device time.

Patches the in-kernel cloud pieces out one at a time: the cloud-optics
LUT interp, the delta-scale/combine stage, and the general-g PIFM form.
Timing only (wrong numbers by design). Round-5 findings at 28.8k
(docs/PERFORMANCE.md): interp ~3.96, combine ~4.99, general-g PIFM
~2.44 ms; the combine's 6-divide delta_scale chain was collapsed to the
subtraction form off this decomposition, and the pifm-fma candidate was
rejected at +0.21 ms WITHOUT touching the kernel.

Usage: python scripts/ablate_allsky_sw.py [--ncol N] [--tile T]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from _bench_util import timed_best  # noqa: E402


def main() -> None:
    import jax.numpy as jnp

    import rte_rrtmgp_nn_tpu.ops.pallas.sw_megakernel as SWM

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
        # the divide chains + the other two expansions
        tc = SWM._dot3split(lt + it_, oh)
        return tau_gas + tc, ssa_gas, ssa_gas * 0.5

    def pifm_g0(tau, ssa, g, mu0b, k_min, eps, general_g):
        # clear-sky specialization regardless of clouds: the delta is the
        # general-g gamma/alpha extra VPU work
        return real_pifm(tau, ssa, None, mu0b, k_min, eps, general_g=False)

    def pifm_fma(tau, ssa, g, mu0b, k_min, eps, general_g):
        # REJECTED candidate kept for re-measurement (+0.21 ms, round 5):
        # gammas as fma chains on precomputed sg = ssa*g and mg = mu0*g
        sg = ssa * g
        mg = mu0b * g
        gamma1 = 2.0 - 1.25 * ssa - 0.75 * sg
        gamma2 = 0.75 * (ssa - sg)
        gamma3 = 0.5 - 0.75 * mg
        gamma4 = 0.5 + 0.75 * mg
        alpha1 = gamma1 * gamma4 + gamma2 * gamma3
        alpha2 = gamma1 * gamma3 + gamma2 * gamma4
        k = jnp.sqrt(jnp.maximum((gamma1 - gamma2) * (gamma1 + gamma2),
                                 k_min))
        mu0_inv = 1.0 / mu0b
        tnoscat = jnp.exp(-tau * mu0_inv)
        e1 = jnp.exp(-tau * k)
        e2 = e1 * e1
        k2e = 2.0 * k * e1
        k_mu = k * mu0b
        k_mu2 = k_mu * k_mu
        k_g3 = k * gamma3
        k_g4 = k * gamma4
        denom = jnp.where(jnp.abs(1.0 - k_mu2) >= eps, 1.0 - k_mu2, eps)
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
        rdir = jnp.clip(rdir, 0.0, 1.0 - tnoscat)
        tdir = jnp.clip(tdir, 0.0, 1.0 - tnoscat - rdir)
        return rdif, tdif, rdir, tdir

    from _bench_util import allsky_mega_fn, allsky_mega_stage

    ctx, args = allsky_mega_stage(ncol, band="sw")  # stage ONCE
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
            fn = allsky_mega_fn(ctx, tile_c=tile_c)  # fresh trace per patch
            ms = timed_best(fn, args)
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
