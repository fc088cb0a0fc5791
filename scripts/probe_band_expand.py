"""Chip probe: in-kernel band->gpt expansion strategies (round-5 item:
"the all-sky band->gpt expansions" slack).

_dot3split expands (rows, nband) -> (rows, ngpt) as THREE bf16 MXU dots
whose K = nband (14/16) pads to 128 -- ~8x pad waste per term. Every
shipped spectral layout is UNIFORM-contiguous (8 or 16 gpts per band), so
the same expansion is a static lane-repeat: exact (no split needed) and
MXU-free. This probe times the REAL all-sky mega kernels with _dot3split
patched per variant (prints mean fluxes so numerics are verified in the
same run; repeat is exact, so means must match the baseline to f32 noise).

Usage: python scripts/probe_band_expand.py [ncol] [band ...]
       (defaults: 28800, both bands)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from _bench_util import allsky_mega_fn, allsky_mega_stage, timed_best  # noqa: E402


def main() -> None:
    import jax.numpy as jnp
    import numpy as np

    import rte_rrtmgp_nn_tpu.ops.pallas.lw_megakernel as LWM
    import rte_rrtmgp_nn_tpu.ops.pallas.sw_megakernel as SWM

    argv = sys.argv[1:]
    ncol = int(argv[0]) if argv else 28800
    bands = argv[1:] or ["lw", "sw"]

    # The shipped default is now MIXED (_dot2split at the three SW cloud
    # sites, _dot3split elsewhere); patch BOTH names so every variant
    # replaces every expansion site and the menu stays apples-to-apples.
    real3, real2 = LWM._dot3split, LWM._dot2split

    def _patch(fake):
        LWM._dot3split = SWM._dot3split = fake
        LWM._dot2split = SWM._dot2split = fake

    def _restore():
        LWM._dot3split = SWM._dot3split = real3
        LWM._dot2split = SWM._dot2split = real2

    def expand_repeat(x, oh):
        # uniform-contiguous bands only: lane-repeat each band gpb times
        nband, ngpt = oh.shape
        return jnp.repeat(x, ngpt // nband, axis=1)

    def expand_bcast_concat(x, oh):
        nband, ngpt = oh.shape
        gpb = ngpt // nband
        return jnp.concatenate(
            [jnp.broadcast_to(x[:, b:b + 1], (x.shape[0], gpb))
             for b in range(nband)], axis=1)

    def expand_dot1(x, oh):  # cost floor of the dot form (INEXACT bf16)
        return jnp.dot(x.astype(jnp.bfloat16), oh.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    def expand_packed(x, oh):
        # EXACT single bf16 pass: the 3 split terms ride the one dot's
        # unused K slots (3*nband <= 128) against a row-stacked one-hot;
        # the MXU's K-order accumulation reproduces hi + mid + lo
        from rte_rrtmgp_nn_tpu.ops.table_split import split3_bf16

        hi, mid, lo = split3_bf16(x)
        xp = jnp.concatenate([hi, mid, lo], axis=1).astype(jnp.bfloat16)
        oh3 = jnp.concatenate([oh, oh, oh], axis=0).astype(jnp.bfloat16)
        return jnp.dot(xp, oh3, preferred_element_type=jnp.float32)

    def expand_3bf16(x, oh):
        # EXACT: hi/mid/lo are bf16-representable by construction, so the
        # explicit casts are lossless and each dot is ONE bf16 MXU pass
        # (f32-dtype operands lower as multi-pass)
        from rte_rrtmgp_nn_tpu.ops.table_split import split3_bf16

        f32, bf = jnp.float32, jnp.bfloat16
        hi, mid, lo = split3_bf16(x)
        ohb = oh.astype(bf)
        return (jnp.dot(hi.astype(bf), ohb, preferred_element_type=f32)
                + jnp.dot(mid.astype(bf), ohb, preferred_element_type=f32)
                + jnp.dot(lo.astype(bf), ohb, preferred_element_type=f32))

    def expand_2split(x, oh):
        # drops the lo term: 7.5e-6 relative (CLAUDE.md probe fact)
        f32, bf = jnp.float32, jnp.bfloat16
        hi = x.astype(bf).astype(f32)
        mid = x - hi
        return (jnp.dot(hi, oh, preferred_element_type=f32)
                + jnp.dot(mid, oh, preferred_element_type=f32))

    variants = [("dot3split", real3), ("dot2split", expand_2split),
                ("dot3-bf16", expand_3bf16),
                ("dot-packed", expand_packed),
                ("dot1-bf16", expand_dot1)]

    for band in bands:
        print(f"== band {band}  ncol {ncol}", flush=True)
        ctx, args = allsky_mega_stage(ncol, band=band)
        base = None
        for name, fake in variants:
            _patch(fake)
            try:
                fn = allsky_mega_fn(ctx)
                ms = timed_best(fn, args)
                out = fn(*args)
                dn = np.asarray(out.flux_dn, np.float64)
                up = np.asarray(out.flux_up, np.float64)
                if base is None:
                    base = (dn, up)
                d = max(np.max(np.abs(dn - base[0])),
                        np.max(np.abs(up - base[1])))
                print(f"  {name:14s}: {ms:8.3f} ms   mean dn/up "
                      f"{dn.mean():.4f}/{up.mean():.4f}   "
                      f"max|d| vs 3term {d:.2e} W/m2", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:14s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
            finally:
                _restore()


if __name__ == "__main__":
    main()
