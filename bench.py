"""Benchmark: RFMIP clear-sky LW+SW with NN gas optics on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload matches the reference's headline benchmark (BASELINE.md): 1800
columns x 60 layers, LW g-128 + SW g-112 NN gas optics + solvers. Baseline:
the reference's best CPU numbers (Intel ifort+MKL, refactored+NN):
LW 183.4 ms + SW 271.0 ms for 1800 columns -> 3961 columns/s.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: fresh jit compiles of the driver cores can
# exceed 10 minutes through the TPU tunnel; cached reloads take seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "artifacts",
    "last_tpu_bench.json")


def ensure_live_backend(probe_timeout_s: int | None = None,
                        budget_s: float | None = None) -> str:
    """The remote-TPU tunnel can wedge outright (backend init hangs forever
    in the PJRT client, unkillable in-process). Probe it in a SUBPROCESS
    with a timeout, and keep re-probing with backoff until ``budget_s`` is
    exhausted (the tunnel often un-wedges after tens of minutes). If it
    never comes up, force the CPU backend so the bench still produces a
    (clearly marked) result instead of hanging.

    Returns "tpu" (live), "cpu-requested" (CPU was asked for up front), or
    "tpu-unreachable" (fell back to CPU after exhausting the budget).

    Env knobs: BENCH_TPU_PROBE_TIMEOUT_S (per-probe, default 120),
    BENCH_TPU_PROBE_BUDGET_S (total wait, default 1800)."""
    import subprocess

    if probe_timeout_s is None:
        probe_timeout_s = int(os.environ.get("BENCH_TPU_PROBE_TIMEOUT_S", 120))
    if budget_s is None:
        budget_s = float(os.environ.get("BENCH_TPU_PROBE_BUDGET_S", 1800))

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # Only an EXPLICIT cpu request pins the CPU backend (the env var
        # alone can lose to the preset axon plugin; pin the config too,
        # same belt-and-braces as tests/conftest.py). An UNSET var falls
        # through to the probe: default PJRT discovery may well find a
        # TPU, and silently benching CPU would publish a ~175x-low artifact.
        import jax

        jax.config.update("jax_platforms", "cpu")
        return "cpu-requested"

    # The probe must also exercise a real device op: backend init can
    # succeed while the first executable enqueue hangs.
    probe_src = ("import jax, jax.numpy as jnp; jax.devices(); "
                 "jnp.ones((8,128)).sum().block_until_ready(); "
                 "print(jax.default_backend())")
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=probe_timeout_s, check=True, capture_output=True,
            )
            if b"tpu" in out.stdout:
                return "tpu"
        except Exception:
            pass
        remaining = deadline - time.time()
        if remaining <= 0:
            break
        wait = min(120.0, max(15.0, remaining / 8), remaining)
        print(json.dumps({
            "probe_attempt": attempt,
            "status": "tpu unreachable, retrying",
            "next_probe_in_s": round(wait),
            "budget_remaining_s": round(remaining),
        }), file=sys.stderr)
        time.sleep(wait)

    print(json.dumps({
        "warning": "TPU backend unreachable (tunnel wedged) after "
                   f"{attempt} probes over {budget_s:.0f}s; "
                   "falling back to CPU for this run"
    }), file=sys.stderr)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "tpu-unreachable"

BASELINE_COLS_PER_S = 1800.0 / (0.1834 + 0.2710)  # reference Intel CPU LW+SW


def timed_resident_slope(fn, args, k_lo=50, k_hi=450, reps=3):
    """Per-iteration DEVICE time of ``fn(*args)`` via two device-resident
    ``fori_loop`` timings: slope (T_hi - T_lo)/(k_hi - k_lo).

    Round-5 decomposition (docs/PERFORMANCE.md): one dispatch+sync through
    the TPU tunnel costs a FIXED ~26 ms regardless of program size, so the
    old enqueue-20-block-once methodology reads 0.6 ms of device work as
    1.73 ms at 1800 cols. Running K iterations inside ONE jitted fori_loop
    pays the fixed cost once; differencing two K values cancels it exactly.
    Float inputs are perturbed by ``i * 1e-30`` inside the loop (absorbed
    in f32 -> results bit-identical) so XLA cannot hoist the loop-invariant
    staging ops; the carry consumes a sum of the first output leaf so
    nothing dead-codes."""
    import jax
    import jax.numpy as jnp

    flat, treedef = jax.tree_util.tree_flatten(args)
    is_f = [hasattr(lf, "dtype") and jnp.issubdtype(lf.dtype, jnp.floating)
            for lf in flat]

    def make(k):
        @jax.jit
        def resident(*fl):
            def body(i, acc):
                p = [lf + i * jnp.asarray(1e-30, lf.dtype) if f else lf
                     for lf, f in zip(fl, is_f)]
                out = fn(*jax.tree_util.tree_unflatten(treedef, p))
                leaf = jax.tree_util.tree_leaves(out)[0]
                return acc + jnp.sum(leaf).astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return resident

    times = []
    for k in (k_lo, k_hi):
        r = make(k)
        jax.block_until_ready(r(*flat))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(r(*flat))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return max((times[1] - times[0]) / (k_hi - k_lo), 1e-9)


def main() -> None:
    backend_status = ensure_live_backend()
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_nn_tpu.drivers.rfmip import (
        _lw_core_lay_major,
        _lw_core_mega4_canon,
        _sw_core_lay_major,
        _sw_core_mega_canon,
        canonicalize_rfmip_inputs,
        default_solar_source,
    )
    from rte_rrtmgp_nn_tpu.drivers.rfmip_io import read_rfmip
    from rte_rrtmgp_nn_tpu.gasoptics.planck import (
        PlanckTable,
        lw_spectral_g128,
        sw_spectral_g112,
    )
    from rte_rrtmgp_nn_tpu.models.network import load_model_netcdf
    import functools

    dtype = jnp.float32
    data = read_rfmip(
        "/root/reference/examples/rfmip-clear-sky/"
        "multiple_input4MIPs_radiation_RFMIP_UColorado-RFMIP-1-2_none.nc"
    )
    ncol = data.ncol  # 1800

    D = "/root/reference/neural/data/"
    lw_models = [load_model_netcdf(D + "lw-g128-210809_both_BEST.nc")]
    sw_models = [
        load_model_netcdf(D + "sw-g112-210809_absorption_BEST.nc"),
        load_model_netcdf(D + "sw-g112-210809_rayleigh_BEST.nc"),
    ]

    lw_spec = lw_spectral_g128()
    sw_spec = sw_spectral_g112()
    table = PlanckTable.compute(lw_spec.band_lims_wvn_array, dtype=dtype)
    solar = jnp.asarray(default_solar_source(sw_spec), dtype)

    # TPU: the fused megakernel cores on canonical lay-major inputs
    # (docs/PERFORMANCE.md); elsewhere the staged lay-major cores (Pallas
    # interpret mode would distort timings).
    use_mega = jax.default_backend() == "tpu"
    if use_mega:
        # tile_c=None -> driver policy picks a tile DIVIDING ncol
        # (pick_tile_c; kills the fused-input ceil-pad copy at 1800 cols)
        lw_core = functools.partial(_lw_core_mega4_canon, tile_c=None)
        sw_core = functools.partial(_sw_core_mega_canon, tile_c=None)
    else:
        lw_core, sw_core = _lw_core_lay_major, _sw_core_lay_major
    lw_fn = jax.jit(
        functools.partial(
            lw_core, lw_models, table, lw_spec,
            top_at_1=data.top_at_1,
        )
    )
    sw_fn = jax.jit(
        functools.partial(
            sw_core, sw_models, sw_spec, solar,
            top_at_1=data.top_at_1,
        )
    )

    tsfc = jnp.asarray(data.tsfc, dtype)
    emis = jnp.broadcast_to(
        jnp.asarray(data.sfc_emis, dtype)[:, None], (ncol, lw_spec.nband))
    mu0 = jnp.asarray(np.cos(np.deg2rad(data.sza)), dtype)
    usecol = jnp.asarray(data.sza < 90.0)
    if use_mega:
        play_t, plev_t, tlay_t, tlev_t, concs_t = canonicalize_rfmip_inputs(
            data)
        concs = {k: jnp.asarray(v, dtype) for k, v in concs_t.items()}
        lw_args = (
            jnp.asarray(play_t, dtype), jnp.asarray(plev_t, dtype),
            jnp.asarray(tlay_t, dtype), jnp.asarray(tlev_t, dtype),
            tsfc, emis, concs,
        )
        sw_args = (
            jnp.asarray(play_t, dtype), jnp.asarray(plev_t, dtype),
            jnp.asarray(tlay_t, dtype), jnp.asarray(data.sfc_alb, dtype),
            mu0, usecol, jnp.asarray(data.tsi, dtype), concs,
        )
    else:
        concs = {k: jnp.asarray(v, dtype)
                 for k, v in data.gas_concs.concs.items()}
        lw_args = (
            jnp.asarray(data.play, dtype), jnp.asarray(data.plev, dtype),
            jnp.asarray(data.tlay, dtype), jnp.asarray(data.tlev, dtype),
            tsfc, emis, concs,
        )
        sw_args = (
            jnp.asarray(data.play, dtype), jnp.asarray(data.plev, dtype),
            jnp.asarray(data.tlay, dtype), jnp.asarray(data.sfc_alb, dtype),
            mu0, usecol, jnp.asarray(data.tsi, dtype), concs,
        )

    lw_args = jax.device_put(lw_args)
    sw_args = jax.device_put(sw_args)

    # warmup/compile
    jax.block_until_ready(lw_fn(*lw_args))
    jax.block_until_ready(sw_fn(*sw_args))

    # timed steady-state: best of 3 repetitions (the tunnel to the chip
    # has erratic slow phases; min is the honest device-throughput number)
    n_iter = 20

    def timed(fns_args):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                for fn, a in fns_args:
                    out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n_iter)
        return best

    lw_percall = timed([(lw_fn, lw_args)])
    sw_percall = timed([(sw_fn, sw_args)])
    lw = lw_fn(*lw_args)

    if jax.default_backend() == "tpu":
        # Headline = device-resident loop slope: the tunnel charges a fixed
        # ~26 ms per dispatch+sync, which the 20-iter enqueue smears into
        # every per-call number (+~1.3 ms/call); the slope cancels it and
        # measures what the CHIP does per batch (docs/PERFORMANCE.md).
        lw_elapsed = timed_resident_slope(lw_fn, lw_args)
        sw_elapsed = timed_resident_slope(sw_fn, sw_args)
        timing = ("device-resident fori_loop slope K=50..450 (cancels the "
                  "tunnel's fixed dispatch cost); *_ms_percall = 20-iter "
                  "enqueue incl. amortized dispatch")
    else:
        # CPU: per-call dispatch overhead is negligible and a 450-iter
        # resident loop would take minutes; keep the enqueue timing.
        lw_elapsed, sw_elapsed = lw_percall, sw_percall
        timing = "20-iter enqueue (cpu)"
    elapsed = lw_elapsed + sw_elapsed

    cols_per_s = ncol / elapsed
    result = {
        "metric": "rfmip_clearsky_lw_sw_columns_per_s_per_chip",
        "value": round(cols_per_s, 1),
        "unit": "columns/s",
        "vs_baseline": round(cols_per_s / BASELINE_COLS_PER_S, 2),
        "lw_ms": round(lw_elapsed * 1e3, 2),
        "sw_ms": round(sw_elapsed * 1e3, 2),
        "lw_ms_percall": round(lw_percall * 1e3, 2),
        "sw_ms_percall": round(sw_percall * 1e3, 2),
        "timing": timing,
        "ncol": ncol,
        "vs_baseline_lw": round((ncol / lw_elapsed) / (1800.0 / 0.1834), 2),
        "vs_baseline_sw": round((ncol / sw_elapsed) / (1800.0 / 0.2710), 2),
        "backend": jax.default_backend(),
    }
    # sanity guard: don't report garbage physics
    mean_dn = float(np.mean(np.asarray(lw.flux_dn)))
    if not (102.0 < mean_dn < 105.0):
        result["warning"] = f"LW mean flux_dn {mean_dn:.3f} outside expected range"

    if result["backend"] == "tpu":
        # Record last-known-good so a future wedged-tunnel run can report
        # honestly instead of emitting a bare CPU number as the artifact.
        try:
            os.makedirs(os.path.dirname(LAST_GOOD_PATH), exist_ok=True)
            with open(LAST_GOOD_PATH, "w") as f:
                json.dump(dict(result, captured_at=time.strftime(
                    "%Y-%m-%dT%H:%M:%S")), f)
        except OSError:
            pass
    elif backend_status == "tpu-unreachable":
        result["tpu_unreachable"] = True
        try:
            with open(LAST_GOOD_PATH) as f:
                result["last_known_good_tpu"] = json.load(f)
        except (OSError, ValueError):
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
