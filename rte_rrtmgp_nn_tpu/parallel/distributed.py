"""Multi-host initialization and cross-host meshes.

The reference has no distributed backend (single process + OpenMP). The
TPU-native scaling path (SURVEY.md section 2.8/5): initialize
jax.distributed on each host, build a global ('col', 'gpt') mesh spanning
the slice, shard columns host-locally (halo-free), and let XLA place
collectives on ICI within the slice. Only flux statistics / diagnostics
reductions cross chips.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .sharding import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op on single-process setups).

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly for other fabrics.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process / already-initialized environments
        pass


def global_mesh(n_gpt: int = 1):
    """Mesh over ALL devices across hosts: 'col' spans hosts (data parallel
    over DCN+ICI), 'gpt' stays within a host's chips (ICI only) so the
    spectral-axis collectives never cross hosts."""
    devices = np.array(jax.devices())
    return make_mesh(n_col=len(devices) // n_gpt, n_gpt=n_gpt, devices=devices.tolist())


def local_column_slice(ncol_global: int) -> tuple[int, int]:
    """This process's contiguous column range under even host splitting
    (the host-side analogue of the column block loop)."""
    p, n = jax.process_index(), jax.process_count()
    per = ncol_global // n
    start = p * per
    size = per if p < n - 1 else ncol_global - start
    return start, size
