"""Explicit per-device SPMD via shard_map + distributed metric reductions.

Most of the framework scales through the compiler path: NamedSharding
inputs under jit, with XLA/GSPMD inserting collectives (parallel/
sharding.py). This module is the explicit counterpart -- `shard_map`
bodies where the per-device program and its collectives are written out
by hand. Two uses:

  - guaranteed-local column solves: columns are halo-free, so running the
    solver inside shard_map over 'col' provably never inserts a
    cross-device collective in the hot loop (GSPMD usually gets this
    right; shard_map makes it a property of the program, not a compiler
    outcome);
  - distributed flux statistics: the metric reductions the reference
    computes serially on the host after unblocking
    (rrtmgp_rfmip_lw.F90 accuracy summaries) become psum/pmin/pmax trees
    over the mesh, so diagnostics never gather full flux fields to one
    host.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def columnwise_shard_map(mesh: Mesh, fn: Callable, n_array_args: int):
    """Wrap a column-batched function so each device runs it on its local
    column shard only (no collectives possible inside).

    fn: pure function of ``n_array_args`` column-leading arrays returning a
    pytree of column-leading arrays. All other closure state (models,
    tables, spectral metadata) must already be baked into ``fn``.
    """
    spec = P("col")
    in_specs = (spec,) * n_array_args

    def body(*args):
        return fn(*args)

    return shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=spec, check_vma=False
    )


def flux_stats(mesh: Mesh, flux: jnp.ndarray):
    """Global (mean, min, max) of a 'col'-sharded flux array without
    gathering it: per-device partial reductions + psum/pmin/pmax over the
    mesh. Returns replicated scalars.

    The shard_map body sees the local (ncol_local, ...) block; the
    collectives ride ICI. Equivalent of the reference's host-side summary
    statistics (e.g. the mean-flux prints, rrtmgp_rfmip_lw.F90:479-487)
    at pod scale.
    """

    def body(x):
        n_local = jnp.asarray(x.size, jnp.float32)
        s = jnp.sum(x, dtype=jnp.float32)
        lo = jnp.min(x)
        hi = jnp.max(x)
        total = jax.lax.psum(s, "col")
        count = jax.lax.psum(n_local, "col")
        lo = jax.lax.pmin(lo, "col")
        hi = jax.lax.pmax(hi, "col")
        return total / count, lo, hi

    return shard_map(
        body,
        mesh=mesh,
        in_specs=P("col"),
        out_specs=P(),
    )(flux)


def weighted_error_stats(mesh: Mesh, flux: jnp.ndarray, ref: jnp.ndarray):
    """Distributed (MAE, RMSE, max-abs-err) between a computed and a
    reference flux field, both 'col'-sharded. The distributed form of the
    eval-loop accuracy metrics (training/eval_loop.py METRIC_NAMES)."""

    def body(x, r):
        d = (x - r).astype(jnp.float32)
        n = jnp.asarray(d.size, jnp.float32)
        sae = jnp.sum(jnp.abs(d))
        sse = jnp.sum(d * d)
        mx = jnp.max(jnp.abs(d))
        n = jax.lax.psum(n, "col")
        sae = jax.lax.psum(sae, "col")
        sse = jax.lax.psum(sse, "col")
        mx = jax.lax.pmax(mx, "col")
        return sae / n, jnp.sqrt(sse / n), mx

    return shard_map(
        body, mesh=mesh, in_specs=(P("col"), P("col")), out_specs=P(),
    )(flux, ref)
