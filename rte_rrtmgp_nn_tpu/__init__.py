"""rte_rrtmgp_nn_tpu: a TPU-native (JAX/XLA/Pallas) radiative-transfer
framework with the capabilities of RTE+RRTMGP-NN.

Layers (bottom-up), mirroring the reference's structure (SURVEY.md section 1):
  config/constants      runtime flags, physical constants
  spectral/optical_props/gas_concs/sources/fluxes   core data model
  ops/                  compute kernels: LW/SW solvers, adding, scans,
                        gas-optics kernels, Pallas fused MLP
  gasoptics/            k-distribution LUT gas optics + NN gas optics
  models/               NN model format (reference-compatible netCDF)
  extensions/           cloud optics, McICA sampling, heating rates, BCs
  parallel/             mesh/sharding for multi-chip column parallelism
  drivers/              RFMIP clear-sky and all-sky end-to-end drivers
  training/             NN training with radiation-in-the-loop evaluation
"""

from .config import config, config_override, set_checks
from .constants import constants
from .fluxes import (
    FluxesBroadband,
    FluxesByband,
    FluxesBygpoint,
    reduce_broadband,
    reduce_byband,
)
from .gas_concs import GasConcs, get_ref_vmr
from .optical_props import (
    OpticalProps1scl,
    OpticalProps2str,
    OpticalPropsNstr,
    delta_scale,
    increment,
    subset,
    validate,
    zeros_1scl,
    zeros_2str,
    zeros_nstr,
)
from .rte import rte_lw, rte_sw
from .sources import SourceFuncLW, SourceFuncSW
from .spectral import SpectralMapping

__version__ = "0.1.0"
