"""Multi-chip scaling benchmark: columns/s/chip and weak-scaling efficiency.

Builds a ('col','gpt'=1) mesh from whatever devices exist, shards the RFMIP
batch over 'col' (columns are halo-free -> pure dp; SURVEY.md section 2.8),
and measures end-to-end LW+SW throughput at a FIXED per-device column count
for growing device counts: weak-scaling efficiency = per-chip throughput at
N devices / per-chip throughput at 1 device. BASELINE.md's north star is
>=85% at multiple hosts.

Run on real multi-chip hardware as-is. Without it, validate the harness on
a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_multichip.py --cols-per-device 64 --iters 3

Prints one JSON line per device count plus a final summary JSON line
(metric multichip_cols_per_s_per_chip, with the efficiency table inside).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np

# Virtual-mesh mode must win over the preset axon tunnel platform BEFORE
# jax initializes (the env var alone loses to it; see tests/conftest.py).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def _replicate_block(data, ncol_target: int):
    """Tile the 1800-column RFMIP batch up/down to exactly ncol_target."""
    import dataclasses

    reps = -(-ncol_target // data.ncol)

    def rep(a):
        a = np.asarray(a)
        return np.concatenate([a] * reps, axis=0)[:ncol_target]

    return dataclasses.replace(
        data,
        play=rep(data.play), plev=rep(data.plev), tlay=rep(data.tlay),
        tlev=rep(data.tlev), tsfc=rep(data.tsfc), sfc_emis=rep(data.sfc_emis),
        sfc_alb=rep(data.sfc_alb), sza=rep(data.sza), tsi=rep(data.tsi),
        gas_concs=type(data.gas_concs)({
            k: (rep(v) if getattr(v, "ndim", 0) == 2 else v)
            for k, v in data.gas_concs.concs.items()
        }),
        nexp=1, nsites=ncol_target,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols-per-device", type=int, default=1824)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--device-counts", type=str, default="",
                    help="comma list; default 1,2,4,...,N")
    ap.add_argument("--core", choices=["staged", "mega"], default="staged",
                    help="mega = the TPU-default fused megakernel cores "
                    "under shard_map (interpret mode off-TPU; VERDICT r3 "
                    "item 6)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        _lw_core_lay_major,
        _sw_core_lay_major,
        canonicalize_rfmip_inputs,
        default_solar_source,
        lw_mega_core_sharded,
        sw_mega_core_sharded,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.gasoptics.planck import (
        PlanckTable,
        lw_spectral_g128,
        sw_spectral_g112,
    )
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf
    from rte_rrtmgp_nn_tpu.parallel.sharding import make_mesh, replicated

    devices = jax.devices()
    ndev_all = len(devices)
    if args.device_counts:
        counts = [int(c) for c in args.device_counts.split(",")]
    else:
        counts = [1]
        while counts[-1] * 2 <= ndev_all:
            counts.append(counts[-1] * 2)
        if counts[-1] != ndev_all:
            counts.append(ndev_all)

    dtype = jnp.float32
    base = read_rfmip(
        "/root/reference/examples/rfmip-clear-sky/"
        "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc"
    )
    lw_models = [load_model_netcdf(
        "/root/reference/neural/data/lw-g128-210809_both_BEST.nc")]
    sw_models = [
        load_model_netcdf(
            "/root/reference/neural/data/sw-g112-210809_absorption_BEST.nc"),
        load_model_netcdf(
            "/root/reference/neural/data/sw-g112-210809_rayleigh_BEST.nc"),
    ]
    lw_spec = lw_spectral_g128()
    sw_spec = sw_spectral_g112()
    table = PlanckTable.compute(lw_spec.band_lims_wvn_array, dtype=dtype)
    solar = jnp.asarray(default_solar_source(sw_spec), dtype)

    per_chip = {}
    for ndev in counts:
        mesh = make_mesh(n_col=ndev, n_gpt=1, devices=devices[:ndev])
        col = NamedSharding(mesh, P("col"))
        repl = replicated(mesh)
        ncol = args.cols_per_device * ndev
        data = _replicate_block(base, ncol)

        put = lambda a, sh=col: jax.device_put(jnp.asarray(a, dtype), sh)
        mu0 = np.cos(np.deg2rad(data.sza))
        usecol = data.sza < 90.0 - 0.5 * np.finfo(np.float32).eps

        if args.core == "mega":
            # The TPU-default fused megakernel cores under explicit
            # shard_map (drivers.rfmip lw/sw_mega_core_sharded): canonical
            # lay-major inputs, columns split over 'col' on axis 1.
            lay = NamedSharding(mesh, P(None, "col"))
            play_t, plev_t, tlay_t, tlev_t, concs_t = (
                canonicalize_rfmip_inputs(data, np.float32))
            putl = lambda a: jax.device_put(jnp.asarray(a, dtype), lay)
            emis_b = jnp.broadcast_to(
                jnp.asarray(data.sfc_emis, dtype)[:, None],
                (ncol, lw_spec.nband))
            concs = {
                k: (putl(v) if np.ndim(v) == 2 else jax.device_put(
                    jnp.asarray(v, dtype), repl))
                for k, v in concs_t.items()
            }
            lw_args = (putl(play_t), putl(plev_t), putl(tlay_t),
                       putl(tlev_t), put(data.tsfc), put(emis_b), concs)
            sw_args = (putl(play_t), putl(plev_t), putl(tlay_t),
                       put(data.sfc_alb), put(mu0),
                       jax.device_put(jnp.asarray(usecol), col),
                       put(data.tsi), concs)
            lw = jax.jit(lw_mega_core_sharded(
                mesh, lw_models, table, lw_spec, top_at_1=base.top_at_1))
            sw = jax.jit(sw_mega_core_sharded(
                mesh, sw_models, sw_spec, solar, top_at_1=base.top_at_1))
        else:
            emis = jnp.broadcast_to(
                jnp.asarray(data.sfc_emis, dtype)[:, None],
                (ncol, lw_spec.nband))
            concs = {
                k: (put(v) if np.ndim(v) == 2 else jax.device_put(
                    jnp.asarray(v, dtype), repl))
                for k, v in data.gas_concs.concs.items()
            }
            lw_args = (put(data.play), put(data.plev), put(data.tlay),
                       put(data.tlev), put(data.tsfc), put(emis), concs)
            sw_args = (put(data.play), put(data.plev), put(data.tlay),
                       put(data.sfc_alb), put(mu0),
                       jax.device_put(jnp.asarray(usecol), col),
                       put(data.tsi), concs)
            lw = jax.jit(functools.partial(
                _lw_core_lay_major, lw_models, table, lw_spec,
                top_at_1=base.top_at_1))
            sw = jax.jit(functools.partial(
                _sw_core_lay_major, sw_models, sw_spec, solar,
                top_at_1=base.top_at_1))

        out = (lw(*lw_args), sw(*sw_args))
        jax.block_until_ready(out)  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = (lw(*lw_args), sw(*sw_args))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        cols_s = ncol / best
        per_chip[ndev] = cols_s / ndev
        print(json.dumps({
            "n_devices": ndev, "ncol": ncol, "s_per_iter": best,
            "cols_per_s": cols_s, "cols_per_s_per_chip": per_chip[ndev],
        }), flush=True)

    eff = {str(n): per_chip[n] / per_chip[counts[0]] for n in counts}
    print(json.dumps({
        "metric": "multichip_cols_per_s_per_chip",
        "value": per_chip[counts[-1]],
        "unit": "cols/s/chip (LW+SW)",
        "n_devices": counts[-1],
        "core": args.core,
        "weak_scaling_efficiency": eff,
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
