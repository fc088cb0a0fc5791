"""Runtime configuration for the TPU-native RTE+RRTMGP-NN framework.

Mirrors the capabilities of the reference's runtime flag module
(``rte/mo_rte_rrtmgp_config.F90:23-40``): extent checking, value checking,
the missing-gas scenario index for the NN input packing, and the
compile-time choices the reference exposes as preprocessor macros
(``DOUBLE_PRECISION``, ``FAST_EXPONENTIAL``, ``compute_Jac``,
``use_Pade_source``).

Design: a single immutable-ish module-level config object. Fields that
affect traced computation (dtype, fast_exp, pade_source) are read at trace
time, so changing them invalidates nothing silently -- jit caches key on the
static values passed down by the front-ends.
"""
from __future__ import annotations

import dataclasses
from contextlib import contextmanager

import jax.numpy as jnp


@dataclasses.dataclass
class RTEConfig:
    # Validate array extents at the Python (trace-time) level.
    check_extents: bool = False
    # Validate array values (host-side helper; not usable inside jit).
    check_values: bool = False
    # Missing-gas handling for NN inputs: 0 = zero concentration,
    # 1 = present-day, 2 = pre-industrial, 3 = future reference VMR.
    # (reference: mo_rte_rrtmgp_config.F90:40, mo_gas_ref_concentrations.F90)
    nn_scenario_index: int = 0
    # Working precision: float32 mirrors the reference's default wp=sp;
    # float64 requires jax.config.update("jax_enable_x64", True).
    dtype: jnp.dtype = jnp.float32
    # Use the Pade-approximant exponential (reference -DFAST_EXPONENTIAL,
    # mo_rte_solver_kernels.F90:90-106).
    fast_exponential: bool = False
    # Use the Pade linear-in-tau source form (reference use_Pade_source,
    # mo_rte_rrtmgp_config.F90:30).
    use_pade_source: bool = False
    # Compute the surface-temperature Jacobian of upward flux
    # (reference compute_Jac, mo_rte_rrtmgp_config.F90:28).
    compute_jac: bool = False
    # Route the broadband LW no-scat solve through the hand-scheduled
    # Pallas kernel (ops/pallas/lw_solver.py). Measured ~10-15% faster than
    # the fused XLA scan on TPU at RFMIP scale, but the solver is <2% of
    # the LW pipeline; off by default, flip on for solver-dominated runs.
    use_pallas_lw_solver: bool = False
    # Use the single-kernel fused pipelines (ops/pallas/lw_megakernel
    # mega4 / sw_megakernel) in the clear-sky drivers. None = auto: on for
    # the TPU backend (measured LW 2.7/44.6 ms vs staged 3.7/89.3 at
    # 1800/57.6k cols, SW 2.65/50.1 vs 3.64/85.9 -- docs/PERFORMANCE.md),
    # off elsewhere (interpret mode is orders of magnitude slower than XLA).
    use_megakernel: bool | None = None

    @property
    def eps(self) -> float:
        return float(jnp.finfo(self.dtype).eps)

    @property
    def tau_thresh(self) -> float:
        # Series-expansion threshold for the linear-in-tau source
        # (reference mo_rte_solver_kernels.F90:764-767).
        return float(jnp.sqrt(jnp.finfo(self.dtype).eps))

    @property
    def k_min(self) -> float:
        # Floor on the two-stream eigenvalue k to avoid div-by-zero
        # (reference mo_rte_solver_kernels.F90:76-82).
        return 1.0e-12 if self.dtype == jnp.float64 else 1.0e-4


config = RTEConfig()


def megakernel_model_ok(models) -> bool:
    """The fused Pallas megakernels hardcode the shipped NN architecture:
    exactly three dense layers, softsign hidden activations, linear output
    (ops/pallas/lw_megakernel.py ``_mega4_kernel``, sw_megakernel). Any
    other depth or activation must take the staged cores, which apply the
    model generically (models/network.py NNModel.apply)."""
    return all(
        len(m.weights) == 3 and len(m.biases) == 3
        and tuple(a.lower() for a in m.activations)
        == ("softsign", "softsign", "linear")
        for m in models
    )


def resolve_use_megakernel(lw: bool = False, models=None) -> bool:
    """Single source of truth for the fused-megakernel dispatch used by
    every driver: config.use_megakernel (None = auto: TPU backend only),
    forced OFF when a numerics flag the kernels hardcode is set --
    ``fast_exponential`` affects every solver exponential (LW trans, SW
    direct beam, SW two-stream; reference exp_fast scope,
    mo_rte_solver_kernels.F90:237,520-526,1293,1311) so it forbids BOTH
    megakernels; ``use_pade_source`` is an LW source form only -- and
    forced OFF for any NN architecture the kernels don't hardcode
    (``megakernel_model_ok``). The staged cores honor the flags; the
    megakernels bake the exact exp + linear-in-tau source."""
    import jax

    use = config.use_megakernel
    if use is None:
        use = jax.default_backend() == "tpu"
    if config.fast_exponential:
        return False
    if lw and config.use_pade_source:
        return False
    if models is not None and not megakernel_model_ok(models):
        return False
    return bool(use)


def set_checks(check_extents: bool | None = None, check_values: bool | None = None):
    """Reference parity: rte_rrtmgp_config_checks (mo_rte_rrtmgp_config.F90:43-61)."""
    if check_extents is not None:
        config.check_extents = check_extents
    if check_values is not None:
        config.check_values = check_values


@contextmanager
def config_override(**kwargs):
    old = {k: getattr(config, k) for k in kwargs}
    try:
        for k, v in kwargs.items():
            setattr(config, k, v)
        yield config
    finally:
        for k, v in old.items():
            setattr(config, k, v)
