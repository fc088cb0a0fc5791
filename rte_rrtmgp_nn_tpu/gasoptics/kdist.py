"""K-distribution state and loader.

Reference parity: ``rrtmgp/mo_gas_optics_rrtmgp.F90`` --
``load_int``/``load_ext`` -> ``init_abs_coeffs`` (:1130-1541): prune gases
to those available, reduce the minor-gas arrays (``reduce_minor_arrays``
:1922-2035), build the flavor list from key species (``create_flavor``
:1802-1836) and the per-g-point flavor map (``create_gpoint_flavor``
:2058-2074), precompute the log-pressure grid -- plus the netCDF variable
set of ``examples/mo_load_coefficients.F90:104-250`` (including the
``plank_fraction`` spelling).

Array layouts (C order, g-point minor -- the natural transpose of the
Fortran):
  kmajor, pfracin: (ntemp, npres+1, neta, ngpt)
  kminor_{lower,upper}: (ntemp, neta, ncontributors)
  krayl: (2, ntemp, neta, ngpt)       [itropo]
  vmr_ref: (2, 1+ngas, ntemp)         [itropo, 0=dry air]
  totplnk: (nPlanckTemp, nband)
Static metadata (flavors, minor maps, grids) are host numpy arrays baked
into the jit trace; only the big tables are device arrays.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..gas_concs import GasConcs, normalize_gas_name
from ..spectral import SpectralMapping
from ..utils import ncio
from .planck import PlanckTable


@dataclasses.dataclass(frozen=True)
class MinorGasData:
    """Per-atmosphere (lower/upper) minor-gas metadata after reduction.
    All static host data; g-point limits are 0-based half-open."""

    kminor: jnp.ndarray  # (ntemp, neta, ncontributors)
    limits_gpt: tuple  # ((start, end), ...) per minor interval
    scales_with_density: tuple  # bool per interval
    scale_by_complement: tuple  # bool per interval
    idx_minor: tuple  # col_gas index of the minor gas per interval
    idx_minor_scaling: tuple  # col_gas index of scaling gas, -1 if none
    kminor_start: tuple  # 0-based start row in kminor per interval

    @property
    def n_minor(self) -> int:
        return len(self.limits_gpt)


jax.tree_util.register_dataclass(
    MinorGasData,
    data_fields=["kminor"],
    meta_fields=[
        "limits_gpt", "scales_with_density", "scale_by_complement",
        "idx_minor", "idx_minor_scaling", "kminor_start",
    ],
)


@dataclasses.dataclass(frozen=True)
class KDist:
    """Loaded k-distribution (LW or SW)."""

    spectral: SpectralMapping
    gas_names: tuple  # reduced to available gases; col_gas axis is [dry] + these
    # reference grids (static host data)
    press_ref_log: tuple  # (npres,) log(Pa), decreasing
    temp_ref: tuple  # (ntemp,) K, increasing
    press_ref_trop_log: float
    # flavors
    flavor: tuple  # ((ig1, ig2), ...) 0-based into col_gas axis (0 = dry)
    gpoint_flavor: tuple  # ((flav_lower, flav_upper), ...) per gpt, 0-based
    # big tables (device)
    vmr_ref: jnp.ndarray  # (2, 1+ngas, ntemp)
    kmajor: jnp.ndarray  # (ntemp, npres+1, neta, ngpt)
    minor_lower: MinorGasData
    minor_upper: MinorGasData
    krayl: Optional[jnp.ndarray] = None  # (2, ntemp, neta, ngpt)
    # LW-only
    pfracin: Optional[jnp.ndarray] = None  # like kmajor
    planck: Optional[PlanckTable] = None
    optimal_angle_fit: Optional[tuple] = None  # (nband, 2) static
    # SW-only
    solar_quiet: Optional[jnp.ndarray] = None  # (ngpt,)
    solar_facular: Optional[jnp.ndarray] = None
    solar_sunspot: Optional[jnp.ndarray] = None
    tsi_default: float = 0.0
    mg_default: float = 0.0
    sb_default: float = 0.0

    # -- queries (reference get_* accessors) --------------------------------
    @property
    def ngas(self) -> int:
        return len(self.gas_names)

    @property
    def nflav(self) -> int:
        return len(self.flavor)

    @property
    def neta(self) -> int:
        return self.kmajor.shape[2]

    @property
    def npres(self) -> int:
        return len(self.press_ref_log)

    @property
    def ntemp(self) -> int:
        return len(self.temp_ref)

    @property
    def ngpt(self) -> int:
        return self.spectral.ngpt

    @property
    def nband(self) -> int:
        return self.spectral.nband

    @property
    def is_internal_source(self) -> bool:
        """LW if the file carried a Planck table (reference: presence of
        totplnk selects gas_optics_int vs _ext)."""
        return self.planck is not None

    @property
    def press_ref_min(self) -> float:
        return float(np.exp(min(self.press_ref_log)))

    @property
    def press_ref_max(self) -> float:
        return float(np.exp(max(self.press_ref_log)))

    @property
    def temp_ref_min(self) -> float:
        return float(self.temp_ref[0])

    @property
    def temp_ref_max(self) -> float:
        return float(self.temp_ref[-1])

    @property
    def press_ref_log_delta(self) -> float:
        return (min(self.press_ref_log) - max(self.press_ref_log)) / (self.npres - 1)

    @property
    def temp_ref_delta(self) -> float:
        return (self.temp_ref_max - self.temp_ref_min) / (self.ntemp - 1)

    def solar_source(self, mg_index: Optional[float] = None, sb_index: Optional[float] = None,
                     tsi: Optional[float] = None) -> jnp.ndarray:
        """Spectral solar source from the NRLSSI2 terms
        (reference set_solar_variability / set_tsi,
        mo_gas_optics_rrtmgp.F90:1058-1120). With no arguments, the default
        facular/sunspot indices; with ``tsi``, rescaled to that total."""
        mg = self.mg_default if mg_index is None else mg_index
        sb = self.sb_default if sb_index is None else sb_index
        # NRLSSI2 a/b offsets (reference :1075-1083)
        a_offset = 0.1495954
        b_offset = 0.00066696
        src = (
            self.solar_quiet
            + (mg - a_offset) * self.solar_facular
            + (sb - b_offset) * self.solar_sunspot
        )
        if tsi is not None:
            src = src * (tsi / jnp.sum(src))
        return src


jax.tree_util.register_dataclass(
    KDist,
    data_fields=[
        "vmr_ref", "kmajor", "minor_lower", "minor_upper", "krayl",
        "pfracin", "planck", "solar_quiet", "solar_facular", "solar_sunspot",
    ],
    meta_fields=[
        "spectral", "gas_names", "press_ref_log", "temp_ref",
        "press_ref_trop_log", "flavor", "gpoint_flavor", "optimal_angle_fit",
        "tsi_default", "mg_default", "sb_default",
    ],
)


def _reduce_minor(
    f: ncio.NCFile,
    suffix: str,
    gas_minor: list[str],
    identifier_minor: list[str],
    reduced_gas_names: list[str],
    dtype,
) -> MinorGasData:
    """Prune minor-gas intervals to available gases and repack the kminor
    table (reference reduce_minor_arrays + create_idx_minor[_scaling])."""
    kminor = f.read(f"kminor_{suffix}", np.float64)  # (ntemp, neta, ncontrib)
    minor_gases = [normalize_gas_name(s) for s in f.read_strings(f"minor_gases_{suffix}")]
    limits = f.read(f"minor_limits_gpt_{suffix}").astype(int)  # (nminor, 2) 1-based
    swd = f.read(f"minor_scales_with_density_{suffix}").astype(bool).ravel()
    sbc = f.read(f"scale_by_complement_{suffix}").astype(bool).ravel()
    scaling_gas = [normalize_gas_name(s) for s in f.read_strings(f"scaling_gas_{suffix}")]
    kstart = f.read(f"kminor_start_{suffix}").astype(int).ravel()  # 1-based

    gas_minor_n = [normalize_gas_name(s) for s in gas_minor]
    ident_n = [normalize_gas_name(s) for s in identifier_minor]

    keep_rows = []
    out_limits, out_swd, out_sbc, out_idx, out_idx_scl, out_kstart = [], [], [], [], [], []
    pos = 0
    for i, mg in enumerate(minor_gases):
        idx_mnr = ident_n.index(mg)
        base_gas = gas_minor_n[idx_mnr]
        ng = limits[i, 1] - limits[i, 0] + 1
        if base_gas in reduced_gas_names:
            out_limits.append((int(limits[i, 0] - 1), int(limits[i, 1])))  # 0-based half-open
            out_swd.append(bool(swd[i]))
            out_sbc.append(bool(sbc[i]))
            # col_gas axis: 0 = dry, 1.. = reduced gases
            out_idx.append(1 + reduced_gas_names.index(base_gas))
            sg = scaling_gas[i]
            out_idx_scl.append(1 + reduced_gas_names.index(sg) if sg in reduced_gas_names else -1)
            out_kstart.append(pos)
            keep_rows.extend(range(int(kstart[i] - 1), int(kstart[i] - 1 + ng)))
            pos += ng
    kred = kminor[:, :, keep_rows] if keep_rows else kminor[:, :, :0]
    return MinorGasData(
        kminor=jnp.asarray(kred, dtype),
        limits_gpt=tuple(out_limits),
        scales_with_density=tuple(out_swd),
        scale_by_complement=tuple(out_sbc),
        idx_minor=tuple(out_idx),
        idx_minor_scaling=tuple(out_idx_scl),
        kminor_start=tuple(out_kstart),
    )


def load_kdist(path: str, available_gases: list[str] | GasConcs, dtype=jnp.float32) -> KDist:
    """Load a k-distribution netCDF file, keeping only gases in
    ``available_gases`` (reference load_and_init + init_abs_coeffs)."""
    if isinstance(available_gases, GasConcs):
        available_gases = available_gases.gas_names
    avail = [normalize_gas_name(g) for g in available_gases]

    with ncio.NCFile(path) as f:
        gas_names_all = [normalize_gas_name(s) for s in f.read_strings("gas_names")]
        key_species = f.read("key_species").astype(int)  # C (nbnd, 2, 2): [band, atm, pair]
        band_lims_wvn = f.read("bnd_limits_wavenumber", np.float64)
        band2gpt = f.read("bnd_limits_gpt").astype(int)  # (nbnd, 2) 1-based
        press_ref = f.read("press_ref", np.float64).ravel()
        temp_ref = f.read("temp_ref", np.float64).ravel()
        press_ref_trop = float(f.read("press_ref_trop"))
        vmr_ref = f.read("vmr_ref", np.float64)  # C (ntemp, next, 2)
        kmajor = f.read("kmajor", np.float64)  # C (ntemp, npres+1, neta, ngpt)
        gas_minor = f.read_strings("gas_minor")
        identifier_minor = f.read_strings("identifier_minor")

        # prune to available gases (preserving k-dist order)
        reduced = [g for g in gas_names_all if g in avail]

        # vmr_ref: file axis 1 is [dry] + gases (nextabsorbers = ngas+1)
        vmr_t = np.transpose(vmr_ref, (2, 1, 0))  # (2, next, ntemp)
        sel = [0] + [1 + gas_names_all.index(g) for g in reduced]
        vmr_red = vmr_t[:, sel, :]

        minor_lower = _reduce_minor(f, "lower", gas_minor, identifier_minor, reduced, dtype)
        minor_upper = _reduce_minor(f, "upper", gas_minor, identifier_minor, reduced, dtype)

        # key species -> reduced indices FIRST, then (0,0) -> (2,2): the
        # reference rewrites AFTER create_key_species_reduce
        # (mo_gas_optics_rrtmgp.F90:1509-1514,1764-1771), so (2,2) means
        # the second gas of the REDUCED list, not of the file's gas list
        nbnd = key_species.shape[0]
        ks_red = np.zeros((nbnd, 2, 2), dtype=int)
        for ib in range(nbnd):
            for ia in range(2):
                pair = key_species[ib, ia, :]
                out = []
                for v in pair:
                    if v == 0:
                        out.append(0)
                    else:
                        g = gas_names_all[v - 1]
                        if g not in reduced:
                            raise ValueError(f"key species {g} not in available gases")
                        out.append(1 + reduced.index(g))
                if out == [0, 0]:
                    out = [2, 2]
                ks_red[ib, ia] = out
        # flavor list: unique (ig1, ig2) pairs in first-appearance order
        flavor: list[tuple[int, int]] = []
        for ib in range(nbnd):
            for ia in range(2):
                pair = (int(ks_red[ib, ia, 0]), int(ks_red[ib, ia, 1]))
                if pair not in flavor:
                    flavor.append(pair)
        spectral = SpectralMapping.from_fortran_limits(band2gpt, band_lims_wvn)
        g2b = spectral.gpt2band
        gpoint_flavor = tuple(
            (
                flavor.index((int(ks_red[g2b[ig], 0, 0]), int(ks_red[g2b[ig], 0, 1]))),
                flavor.index((int(ks_red[g2b[ig], 1, 0]), int(ks_red[g2b[ig], 1, 1]))),
            )
            for ig in range(spectral.ngpt)
        )

        kw = dict(
            spectral=spectral,
            gas_names=tuple(reduced),
            press_ref_log=tuple(np.log(press_ref).tolist()),
            temp_ref=tuple(temp_ref.tolist()),
            press_ref_trop_log=float(np.log(press_ref_trop)),
            flavor=tuple(flavor),
            gpoint_flavor=gpoint_flavor,
            vmr_ref=jnp.asarray(vmr_red, dtype),
            kmajor=jnp.asarray(kmajor, dtype),
            minor_lower=minor_lower,
            minor_upper=minor_upper,
        )
        if f.has_var("rayl_lower"):
            rl = f.read("rayl_lower", np.float64)
            ru = f.read("rayl_upper", np.float64)
            kw["krayl"] = jnp.asarray(np.stack([rl, ru]), dtype)
        if f.has_var("totplnk"):
            totplnk = f.read("totplnk", np.float64)  # C (nbnd, nT)
            kw["planck"] = PlanckTable(
                totplnk=jnp.asarray(totplnk.T, dtype),
                temp_ref_min=float(temp_ref[0]),
                totplnk_delta=(float(temp_ref[-1]) - float(temp_ref[0])) / (totplnk.shape[1] - 1),
            )
            kw["pfracin"] = jnp.asarray(f.read("plank_fraction", np.float64), dtype)
            if f.has_var("optimal_angle_fit"):
                oaf = f.read("optimal_angle_fit", np.float64)  # C (nbnd, nfit)
                kw["optimal_angle_fit"] = tuple(map(tuple, oaf.tolist()))
        else:
            kw["solar_quiet"] = jnp.asarray(f.read("solar_source_quiet", np.float64), dtype)
            kw["solar_facular"] = jnp.asarray(f.read("solar_source_facular", np.float64), dtype)
            kw["solar_sunspot"] = jnp.asarray(f.read("solar_source_sunspot", np.float64), dtype)
            kw["tsi_default"] = float(f.read("tsi_default"))
            kw["mg_default"] = float(f.read("mg_default"))
            kw["sb_default"] = float(f.read("sb_default"))
    return KDist(**kw)
