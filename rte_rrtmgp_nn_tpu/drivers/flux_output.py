"""Flux output writing and golden-file comparison.

Reference parity: ``mo_rfmip_io.F90 unblock_and_write`` (:703-871, writing
rlu/rld/rsu/rsd flux variables in RFMIP layout) and the CI comparators
``examples/rfmip-clear-sky/_compare-to-reference.py`` /
``examples/all-sky/compare-to-reference.py`` (abs-diff against reference
flux files with a failure threshold; :25-60).
"""
from __future__ import annotations

from typing import Mapping, Optional

import numpy as np

from ..utils import ncio


def write_fluxes_rfmip(
    path: str,
    fluxes: Mapping[str, np.ndarray],
    plev: np.ndarray,
    nexp: int,
    nsites: int,
) -> None:
    """Write flux fields in the RFMIP output layout (expt, site, level).

    fluxes: name (e.g. 'rlu', 'rld', 'rsu', 'rsd', 'rsdcs'...) ->
    (ncol = nexp*nsites, nlev) array.
    """
    nlev = plev.shape[-1]
    dims = {"expt": nexp, "site": nsites, "level": nlev}
    variables = {
        name: (("expt", "site", "level"), np.asarray(v, np.float32).reshape(nexp, nsites, nlev))
        for name, v in fluxes.items()
    }
    variables["pres_level"] = (
        ("expt", "site", "level"),
        np.asarray(plev, np.float64).reshape(nexp, nsites, nlev)
        if plev.ndim > 1 and plev.shape[0] == nexp * nsites
        else np.broadcast_to(np.asarray(plev, np.float64), (nexp, nsites, nlev)).copy(),
    )
    ncio.write_nc(path, dims, variables)


def compare_flux_files(
    candidate_path: str,
    reference_path: str,
    variables: Optional[list[str]] = None,
    fail_threshold: float = 1.0e-5,
    report_threshold: float = 1.0e-10,
    verbose: bool = True,
) -> dict:
    """Golden-file comparison: max |candidate - reference| per variable.

    Returns {'passed': bool, 'max_diffs': {var: float}}; thresholds follow
    the reference CI (report 1e-10, fail per-example: 7e-4 W/m2 RFMIP /
    1e-5 all-sky).
    """
    with ncio.NCFile(candidate_path) as fc, ncio.NCFile(reference_path) as fr:
        names = variables or [v for v in fc.variables() if fr.has_var(v)]
        max_diffs = {}
        for v in names:
            if not (fc.has_var(v) and fr.has_var(v)):
                continue
            a = np.asarray(fc.read(v), np.float64)
            b = np.asarray(fr.read(v), np.float64)
            if a.shape != b.shape:
                max_diffs[v] = float("inf")
                continue
            d = float(np.nanmax(np.abs(a - b))) if a.size else 0.0
            max_diffs[v] = d
            if verbose and d > report_threshold:
                print(f"{v}: max abs diff {d:.3e}")
    # zero compared variables = nothing was checked, not a pass (a renamed
    # or truncated candidate file must not sail through the golden gate)
    passed = bool(max_diffs) and all(
        d <= fail_threshold for d in max_diffs.values())
    if verbose and not max_diffs:
        print("FAILED: no common variables to compare")
    if verbose and not passed:
        bad = {k: v for k, v in max_diffs.items() if v > fail_threshold}
        print(f"FAILED variables (> {fail_threshold:g}): {bad}")
    return {"passed": passed, "max_diffs": max_diffs}
