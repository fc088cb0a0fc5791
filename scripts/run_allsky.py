#!/usr/bin/env python
"""Run the all-sky (gases + clouds) example and write a flux netCDF.

The in-process equivalent of the reference's run-allsky-example.py
(examples/all-sky/run-allsky-example.py -> rrtmgp_allsky executable):
Garand atmosphere replicated to --ncol columns, idealized clouds, LW and
SW broadband fluxes written as {lw,sw}_flux_{up,dn}(col, lev) plus the
reference's summary means. --nloops repeats the solve (the reference's
timing knob).

Usage:
    python scripts/run_allsky.py [--ncol 128] [--nloops 1] [--output FILE]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", default=os.path.join(REF, "examples/all-sky/garand-atmos-1.nc"))
    ap.add_argument("--lw-cloud-coeffs", default=os.path.join(
        REF, "extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-lw.nc"))
    ap.add_argument("--sw-cloud-coeffs", default=os.path.join(
        REF, "extensions/cloud_optics/rrtmgp-cloud-optics-coeffs-sw.nc"))
    ap.add_argument("--models-dir", default=os.path.join(REF, "neural/data"))
    ap.add_argument("--ncol", type=int, default=128)
    ap.add_argument("--nloops", type=int, default=1)
    ap.add_argument("--output", default="rrtmgp-allsky-fluxes.nc")
    args = ap.parse_args()

    import numpy as np

    from rte_rrtmgp_nn_tpu.drivers.allsky import allsky_lw, allsky_sw
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf
    from rte_rrtmgp_nn_tpu.utils.ncio import write_nc

    lw_models = [load_model_netcdf(os.path.join(args.models_dir, "lw-g128-210809_both_BEST.nc"))]
    sw_models = [
        load_model_netcdf(os.path.join(args.models_dir, "sw-g112-210809_absorption_BEST.nc")),
        load_model_netcdf(os.path.join(args.models_dir, "sw-g112-210809_rayleigh_BEST.nc")),
    ]

    for loop in range(args.nloops):
        t0 = time.perf_counter()
        flw = allsky_lw(args.input, args.lw_cloud_coeffs, lw_models, ncol=args.ncol)
        fsw = allsky_sw(args.input, args.sw_cloud_coeffs, sw_models, ncol=args.ncol)
        dt = time.perf_counter() - t0
        if loop == 0:
            print(f"ncol = {args.ncol}: LW+SW in {dt:.2f}s (loop {loop + 1})")

    lw_up, lw_dn = np.asarray(flw.flux_up), np.asarray(flw.flux_dn)
    sw_up, sw_dn = np.asarray(fsw.flux_up), np.asarray(fsw.flux_dn)
    # summary means in the reference driver's format (rrtmgp_allsky.F90:479-489)
    print(f"mean LW flux dn: {lw_dn.mean():10.4f} up: {lw_up.mean():10.4f}")
    print(f"mean SW flux dn: {sw_dn.mean():10.4f} up: {sw_up.mean():10.4f}")

    nlev = lw_up.shape[1]
    write_nc(
        args.output,
        dims={"col": args.ncol, "lev": nlev},
        variables={
            "lw_flux_up": (("col", "lev"), lw_up),
            "lw_flux_dn": (("col", "lev"), lw_dn),
            "sw_flux_up": (("col", "lev"), sw_up),
            "sw_flux_dn": (("col", "lev"), sw_dn),
        },
    )
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
