"""GCM-scale streamed sweep benchmark: >=1M columns through the
host->device streaming pipeline (drivers.gcm + parallel.streaming).

This is the build's scaling story (SURVEY.md section 5 long-context note;
the reference's largest run is 1800 columns behind an OpenMP block loop,
rrtmgp_rfmip_lw.F90:364-446). Columns are synthesized by tiling+perturbing
the RFMIP atmospheres; blocks of --block columns stream to the device with
transfer/compute overlap (prefetch 2) while the previous block computes.

Reports end-to-end columns/s for (a) the full LW+SW all-sky sweep and
(b) the clear-sky LW sweep, each as ONE JSON line. A jit warmup on block 0
runs before the timer so the number is steady-state throughput.

Usage: python scripts/bench_gcm.py [--ncol N] [--block B] [--lw-only]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
# NOTE: do NOT put TPU backend flags in XLA_FLAGS here -- the local jaxlib
# parses XLA_FLAGS strictly for the HOST compiler and aborts on unknown
# flags (compiles happen server-side through the tunnel). Kernel VMEM
# budgets are raised per-kernel via pltpu.CompilerParams instead.

from bench import ensure_live_backend  # noqa: E402  (tunnel-wedge guard)

REF = "/root/reference"
RFMIP = os.path.join(
    REF, "examples/rfmip-clear-sky/"
    "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc")
LW_COEFFS = os.path.join(
    REF, "extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-lw.nc")
SW_COEFFS = os.path.join(
    REF, "extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-sw.nc")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=1_036_800,  # 576 x 1800
                    help="total columns (default ~1.04M)")
    ap.add_argument("--block", type=int, default=57_600,
                    help="streaming block size (columns per device step)")
    ap.add_argument("--lw-only", action="store_true",
                    help="skip the all-sky LW+SW sweep")
    ap.add_argument("--resident", action="store_true",
                    help="pre-stage every block in HBM and time the pure "
                         "compute loop (isolates the pipeline from the "
                         "~45 MB/s tunnel host link)")
    ap.add_argument("--precision", choices=["f32", "mixed"], default="f32",
                    help="'mixed' uint16-quantizes the tolerant h2d lanes "
                         "(~2x fewer streamed bytes/column)")
    args = ap.parse_args()

    ensure_live_backend()
    import jax

    from rte_rrtmgp_nn_tpu.drivers.allsky import load_cloud_optics_checked
    from rte_rrtmgp_nn_tpu.drivers.gcm import (
        gcm_sweep_allsky,
        gcm_sweep_lw,
        synthesize_gcm_columns,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf

    base = read_rfmip(RFMIP)
    host = synthesize_gcm_columns(base, args.ncol)
    D = os.path.join(REF, "neural/data/")
    lw_models = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
    sw_models = [
        load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
        load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc"),
    ]
    backend = jax.default_backend()

    if not args.lw_only:
        co_lw = load_cloud_optics_checked(LW_COEFFS)
        co_sw = load_cloud_optics_checked(SW_COEFFS)
        stats = gcm_sweep_allsky(
            host, lw_models, sw_models, co_lw, co_sw,
            block_size=args.block, top_at_1=base.top_at_1, warmup=True,
            resident=args.resident, precision=args.precision)
        print(json.dumps({
            "metric": ("gcm_allsky_lw_sw_columns_per_s_per_chip_resident" if args.resident else "gcm_allsky_lw_sw_columns_per_s_per_chip"),
            "value": round(stats["columns_per_s"], 1),
            "unit": "columns/s",
            "ncol": stats["ncol"],
            "block": args.block,
            "elapsed_s": round(stats["elapsed_s"], 3),
            "mean_olr": round(stats["mean_olr"], 3),
            "mean_lw_sfc_dn": round(stats["mean_lw_sfc_dn"], 3),
            "mean_sw_sfc_dn": round(stats["mean_sw_sfc_dn"], 3),
            "precision": args.precision,
            "backend": backend,
        }))

    stats = gcm_sweep_lw(
        host, lw_models, block_size=args.block, top_at_1=base.top_at_1,
        warmup=True, resident=args.resident, precision=args.precision)
    print(json.dumps({
        "metric": ("gcm_clearsky_lw_columns_per_s_per_chip_resident" if args.resident else "gcm_clearsky_lw_columns_per_s_per_chip"),
        "value": round(stats["columns_per_s"], 1),
        "unit": "columns/s",
        "ncol": stats["ncol"],
        "block": args.block,
        "elapsed_s": round(stats["elapsed_s"], 3),
        "mean_olr": round(stats["mean_olr"], 3),
        "mean_sfc_dn": round(stats["mean_sfc_dn"], 3),
        "precision": args.precision,
        "backend": backend,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
