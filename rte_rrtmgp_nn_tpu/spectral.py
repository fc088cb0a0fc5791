"""Spectral discretization: bands and g-points.

Reference parity: the base-class part of ``rte/mo_optical_props.F90:62-66,
223-279, 1073-1229`` (band2gpt / gpt2band / band_lims_wvn bookkeeping and the
band->g-point ``expand``).

TPU-first design: the mapping is *static* metadata (numpy, hashable), carried
in the aux_data of optical-props pytrees so that jit retraces only when the
spectral discretization actually changes. The band->gpt expansion is a
gather with a precomputed per-gpt band index -- on TPU this lowers to a cheap
one-hot matmul / take along the minor axis.
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _gpt2band(band_lims_gpt: tuple, ngpt: int) -> np.ndarray:
    out = np.zeros(ngpt, dtype=np.int32)
    for ib, (s, e) in enumerate(band_lims_gpt):
        out[s:e] = ib
    out.flags.writeable = False  # cached: shared across callers
    return out


@functools.lru_cache(maxsize=64)
def _band_onehot(band_lims_gpt: tuple, ngpt: int) -> np.ndarray:
    """(nband, ngpt) f32 one-hot band membership, built once per mapping
    (the mapping is frozen/hashable, so repeated un-jitted expand/reduce
    calls reuse it instead of re-running the Python loop)."""
    g2b = _gpt2band(band_lims_gpt, ngpt)
    nband = len(band_lims_gpt)
    oh = (g2b[None, :] == np.arange(nband)[:, None]).astype(np.float32)
    oh.flags.writeable = False  # cached: shared across callers
    return oh


@dataclasses.dataclass(frozen=True)
class SpectralMapping:
    """Bands <-> g-points. Internal g-point indices are 0-based half-open.

    band_lims_gpt: (nband, 2) int, [start, end) g-point range per band.
    band_lims_wvn: (nband, 2) float, wavenumber limits [cm-1] per band.
    """

    band_lims_gpt: tuple  # nested tuples for hashability
    band_lims_wvn: tuple

    # -- constructors -------------------------------------------------------
    @staticmethod
    def create(band_lims_gpt: np.ndarray, band_lims_wvn: np.ndarray) -> "SpectralMapping":
        blg = np.asarray(band_lims_gpt, dtype=np.int64)
        blw = np.asarray(band_lims_wvn, dtype=np.float64)
        if blg.shape != blw.shape or blg.ndim != 2 or blg.shape[1] != 2:
            raise ValueError(f"bad band-limit shapes {blg.shape} {blw.shape}")
        return SpectralMapping(
            band_lims_gpt=tuple(map(tuple, blg.tolist())),
            band_lims_wvn=tuple(map(tuple, blw.tolist())),
        )

    @staticmethod
    def from_fortran_limits(band_lims_gpt_1based: np.ndarray, band_lims_wvn: np.ndarray) -> "SpectralMapping":
        """From the k-distribution file's 1-based inclusive [start, end] pairs
        (reference ``bnd_limits_gpt``)."""
        blg = np.asarray(band_lims_gpt_1based, dtype=np.int64).copy()
        blg[:, 0] -= 1  # to 0-based start, end stays (inclusive 1-based == exclusive 0-based)
        return SpectralMapping.create(blg, band_lims_wvn)

    @staticmethod
    def bands_only(band_lims_wvn: np.ndarray) -> "SpectralMapping":
        """One g-point per band (used by band-resolved cloud optics;
        reference mo_optical_props.F90 init without band_lims_gpt)."""
        nband = np.asarray(band_lims_wvn).shape[0]
        blg = np.stack([np.arange(nband), np.arange(nband) + 1], axis=1)
        return SpectralMapping.create(blg, band_lims_wvn)

    # -- queries ------------------------------------------------------------
    @property
    def nband(self) -> int:
        return len(self.band_lims_gpt)

    @property
    def ngpt(self) -> int:
        return max(e for _, e in self.band_lims_gpt)

    @property
    def gpt2band(self) -> np.ndarray:
        """(ngpt,) 0-based band index of each g-point (cached per mapping)."""
        return _gpt2band(self.band_lims_gpt, self.ngpt)

    @property
    def band_lims_gpt_array(self) -> np.ndarray:
        return np.asarray(self.band_lims_gpt, dtype=np.int64)

    @property
    def band_lims_wvn_array(self) -> np.ndarray:
        return np.asarray(self.band_lims_wvn, dtype=np.float64)

    def gpts_are_equal(self, other: "SpectralMapping") -> bool:
        return self.band_lims_gpt == other.band_lims_gpt

    def bands_are_equal(self, other: "SpectralMapping") -> bool:
        return self.nband == other.nband and np.allclose(
            self.band_lims_wvn_array, other.band_lims_wvn_array
        )

    # -- ops ----------------------------------------------------------------
    def expand(self, band_values: jnp.ndarray) -> jnp.ndarray:
        """Expand a per-band array (..., nband) to per-g-point (..., ngpt).

        Reference parity: mo_rte_lw.F90:429-447 (emissivity expand) and
        mo_optical_props.F90 ``expand``.

        TPU note: implemented as a one-hot matmul rather than a gather --
        minor-axis gathers are slow on TPU while an (nband, ngpt) one-hot
        contraction rides the MXU and fuses with neighbors.
        """
        one_hot = jnp.asarray(
            _band_onehot(self.band_lims_gpt, self.ngpt)
        ).astype(band_values.dtype)
        return band_values @ one_hot

    def reduce_sum(self, gpt_values: jnp.ndarray) -> jnp.ndarray:
        """Sum per-g-point values (..., ngpt) into per-band (..., nband)
        (the byband flux reduction, mo_fluxes_byband_kernels.F90:31-66)."""
        one_hot = jnp.asarray(_band_onehot(self.band_lims_gpt, self.ngpt).T)
        return jnp.einsum("...g,gb->...b", gpt_values, one_hot.astype(gpt_values.dtype))
