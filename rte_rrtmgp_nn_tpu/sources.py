"""Planck / solar source-function containers.

Reference parity: ``rte/mo_source_functions.F90`` (ty_source_func_lw with a
single level source -- this fork's January-2021 refactor -- plus surface
source and its surface-temperature Jacobian, and the optional saved Planck
fraction for NN training data; ty_source_func_sw with the TOA source).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .spectral import SpectralMapping


@dataclasses.dataclass(frozen=True)
class SourceFuncLW:
    lay_source: jnp.ndarray  # (ncol, nlay, ngpt)   Planck source at layer mean T
    lev_source: jnp.ndarray  # (ncol, nlay+1, ngpt) Planck source at levels
    sfc_source: jnp.ndarray  # (ncol, ngpt)
    sfc_source_jac: jnp.ndarray  # (ncol, ngpt)  d(sfc_source)/dT_sfc [W/m2/K]
    spectral: SpectralMapping
    # Saved Planck fraction for NN training-data generation
    # (reference save_pfrac, mo_source_functions.F90:105-111); None if unused.
    planck_frac: Optional[jnp.ndarray] = None  # (ncol, nlay, ngpt)

    @property
    def ncol(self):
        return self.lay_source.shape[0]

    @property
    def nlay(self):
        return self.lay_source.shape[1]

    @property
    def ngpt(self):
        return self.lay_source.shape[2]

    def subset(self, start: int, n: int) -> "SourceFuncLW":
        sl = slice(start, start + n)
        return dataclasses.replace(
            self,
            lay_source=self.lay_source[sl],
            lev_source=self.lev_source[sl],
            sfc_source=self.sfc_source[sl],
            sfc_source_jac=self.sfc_source_jac[sl],
            planck_frac=None if self.planck_frac is None else self.planck_frac[sl],
        )


@dataclasses.dataclass(frozen=True)
class SourceFuncSW:
    toa_source: jnp.ndarray  # (ncol, ngpt) TOA spectral solar flux
    spectral: SpectralMapping

    @property
    def ncol(self):
        return self.toa_source.shape[0]

    @property
    def ngpt(self):
        return self.toa_source.shape[1]


jax.tree_util.register_dataclass(
    SourceFuncLW,
    data_fields=["lay_source", "lev_source", "sfc_source", "sfc_source_jac", "planck_frac"],
    meta_fields=["spectral"],
)
jax.tree_util.register_dataclass(SourceFuncSW, data_fields=["toa_source"], meta_fields=["spectral"])
