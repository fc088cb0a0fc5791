"""Capture a jax.profiler trace of the ALL-SKY SW megakernel core on TPU.

The all-sky analogue of trace_sw.py (VERDICT r4 item 1): Garand atmospheres
replicated to --ncol columns, idealized clouds, LUT cloud optics -- the
production _allsky_sw_core_mega path (reference timing role
rrtmgp_allsky.F90:469-475). Summarize with scripts/trace_summarize.py.
Round-5 finding: at 28.8k the call is ~16.4 ms INSIDE the kernel with
only ~1.2 ms of XLA staging (docs/PERFORMANCE.md).

Usage: python scripts/trace_allsky_sw.py [outdir] [ncol] [tile] [lw|sw]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from _bench_util import allsky_mega_setup  # noqa: E402


def main() -> None:
    import jax

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/allskyswtrace"
    ncol = int(sys.argv[2]) if len(sys.argv) > 2 else 28800
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    band = sys.argv[4] if len(sys.argv) > 4 else "sw"

    fn, args = allsky_mega_setup(ncol, band=band, tile_c=tile)
    print(f"ncol = {ncol}  tile = {tile}  band = {band}", flush=True)
    jax.block_until_ready(fn(*args))  # compile
    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = fn(*args)
        jax.block_until_ready(out)
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
