"""Chip probe: 2-term cloud-LUT interpolation in the all-sky megakernels.

The in-kernel cloud optics (`_cloud_lut_interp`, lw_megakernel.py) runs
SIX one-hot MXU dots per kernel (liquid + ice, 3 bf16 split terms each).
The round-5 2-term adoption for the band->gpt expansions (_dot2split,
7.5e-6 relative -- the probed 2-term table-split error class) applies
identically here: dropping each table's lo term removes two of the six
dots. This probe times the REAL all-sky mega kernels with
_cloud_lut_interp patched per variant and prints per-column flux deltas
vs the 3-term baseline in the same run. Also re-probes SW tile 48 (OOM'd
VMEM with the 3-term tables in round 2b) now that 2-term cut the split
scratch.

Usage: python scripts/probe_cloud_lut.py [ncol] [band ...]
       (defaults: 28800, both bands)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from _bench_util import allsky_mega_fn, allsky_mega_stage, timed_best  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import rte_rrtmgp_nn_tpu.ops.pallas.lw_megakernel as LWM
    import rte_rrtmgp_nn_tpu.ops.pallas.sw_megakernel as SWM

    argv = sys.argv[1:]
    ncol = int(argv[0]) if argv else 28800
    bands = argv[1:] or ["lw", "sw"]

    real = LWM._cloud_lut_interp

    def interp2(wp, re, t_hi, t_mid, t_lo, nsteps, nband, offset, step):
        # 2-term: drop the lo dot (7.5e-6 relative on the LUT values)
        f32 = jnp.float32
        fidx = (re - offset) / step
        i0 = jnp.clip(jnp.floor(fidx), 0.0, float(nsteps - 2))
        frac = fidx - i0
        k = jax.lax.broadcasted_iota(
            jnp.int32, (re.shape[0], nsteps), 1).astype(f32)
        oh0 = (k == i0).astype(f32)
        g = (jnp.dot(oh0, t_hi, preferred_element_type=f32)
             + jnp.dot(oh0, t_mid, preferred_element_type=f32))
        vals = g[:, :3 * nband] + frac * g[:, 3 * nband:]
        e_v = vals[:, :nband]
        s_v = vals[:, nband:2 * nband]
        a_v = vals[:, 2 * nband:]
        t = jnp.where(wp > 0.0, wp * e_v, 0.0)
        ts = t * s_v
        tsg = ts * a_v
        return t, ts, tsg

    def _patch(fake):
        LWM._cloud_lut_interp = fake
        SWM._cloud_lut_interp = fake

    variants = [("lut3", real, 32), ("lut2", interp2, 32),
                ("lut2-tile48", interp2, 48), ("lut3-tile48", real, 48)]

    for band in bands:
        print(f"== band {band}  ncol {ncol}", flush=True)
        ctx, args = allsky_mega_stage(ncol, band=band)
        base = None
        for name, fake, tile in variants:
            _patch(fake)
            try:
                fn = allsky_mega_fn(ctx, tile_c=tile)
                ms = timed_best(fn, args)
                out = fn(*args)
                dn = np.asarray(out.flux_dn, np.float64)
                up = np.asarray(out.flux_up, np.float64)
                if base is None:
                    base = (dn, up)
                d = max(np.max(np.abs(dn - base[0])),
                        np.max(np.abs(up - base[1])))
                print(f"  {name:12s}: {ms:8.3f} ms   mean dn/up "
                      f"{dn.mean():.4f}/{up.mean():.4f}   "
                      f"max|d| vs lut3 {d:.2e} W/m2", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:12s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
            finally:
                _patch(real)


if __name__ == "__main__":
    main()
