"""Chip probe: all-sky SW megakernel tile_c sweep (VERDICT r5).

The driver pins tile_c=32 ("48 OOMs VMEM") -- a note that predated the
100 MiB vmem_limit_bytes raise. Times _allsky_sw_core_mega at several
tiles at one column count. Measured (28.8k, round 5): 32/48/64 a wash
(18.90/18.90/18.76 ms).

Usage: python scripts/probe_allsky_sw_tile.py [ncol] [tile ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from _bench_util import allsky_mega_fn, allsky_mega_stage, timed_best  # noqa: E402


def main() -> None:
    import numpy as np

    ncol = int(sys.argv[1]) if len(sys.argv) > 1 else 28800
    tiles = [int(t) for t in sys.argv[2:]] or [32, 48, 64]
    print(f"ncol = {ncol}", flush=True)
    ctx, args = allsky_mega_stage(ncol, band="sw")  # stage ONCE
    for tile in tiles:
        fn = allsky_mega_fn(ctx, tile_c=tile)
        try:
            ms = timed_best(fn, args)
        except Exception as e:  # noqa: BLE001
            print(f"tile {tile:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        out = fn(*args)
        print(f"tile {tile:3d}: {ms:8.3f} ms   mean_dn "
              f"{float(np.mean(np.asarray(out.flux_dn))):.3f}", flush=True)


if __name__ == "__main__":
    main()
