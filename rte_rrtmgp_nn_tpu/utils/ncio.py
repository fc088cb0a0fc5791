"""Minimal netCDF I/O without the netCDF4 library.

Reads both on-disk formats used by the reference data files:
  - netCDF-4 (HDF5-based), via h5py  (NN models, RFMIP input, Garand atmosphere)
  - netCDF-3 classic, via scipy.io   (cloud-optics coefficients, solar-var tables)

Writes netCDF-3 classic files via scipy.io.netcdf_file -- the interoperability
contract for NN model checkpoints (reference format defined by
``examples/rrtmgp-nn-training/ml_load_save_preproc.py:21-171`` and read by
``neural/mod_network_rrtmgp.F90:58-122``); netCDF-3 is readable by every
netCDF tool including the reference's Fortran loaders.

The reference's equivalents are ``examples/mo_simple_netcdf.F90`` and
``examples/rrtmgp-nn-training/easy_netcdf.F90``.

IMPORTANT dimension-order note: netCDF/HDF5 store row-major with the listed
dims outermost-first, while the reference's Fortran reads them column-major
(first Fortran index fastest). A variable the Fortran code declares as
``var(a, b)`` appears here as a numpy array of shape ``(b, a)``. This module
returns arrays exactly as stored (C order); callers transpose as needed.
"""
from __future__ import annotations

import os
from typing import Any, Mapping, Sequence

import numpy as np


class NCFile:
    """Uniform read access to a netCDF file (HDF5 or classic)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as fh:
            magic = fh.read(4)
        if magic.startswith(b"\x89HDF"):
            import h5py

            self._h5 = h5py.File(path, "r")
            self._nc3 = None
        elif magic.startswith(b"CDF"):
            from scipy.io import netcdf_file

            self._nc3 = netcdf_file(path, "r", mmap=False)
            self._h5 = None
        else:
            raise ValueError(f"{path}: not a netCDF file (magic {magic!r})")

    # -- context manager ----------------------------------------------------
    def __enter__(self) -> "NCFile":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        if self._h5 is not None:
            self._h5.close()
        if self._nc3 is not None:
            self._nc3.close()

    # -- introspection ------------------------------------------------------
    def variables(self) -> list[str]:
        if self._h5 is not None:
            return [k for k in self._h5.keys() if isinstance(self._h5[k], _h5dataset())]
        return list(self._nc3.variables.keys())

    def has_var(self, name: str) -> bool:
        if self._h5 is not None:
            return name in self._h5
        return name in self._nc3.variables

    def dim_size(self, name: str) -> int:
        """Size of a named dimension."""
        if self._h5 is not None:
            # netCDF-4/HDF5: dimensions are scale datasets with the same name.
            if name in self._h5:
                d = self._h5[name]
                return int(d.shape[0]) if d.shape else 1
            # fall back: search variable dimension labels
            for k in self._h5.keys():
                ds = self._h5[k]
                for i, dim in enumerate(ds.dims):
                    if dim.label == name:
                        return int(ds.shape[i])
            raise KeyError(f"{self.path}: no dimension {name!r}")
        size = self._nc3.dimensions.get(name)
        if size is None:
            raise KeyError(f"{self.path}: no dimension {name!r}")
        return int(size)

    def var_dims(self, name: str) -> tuple[str, ...]:
        if self._h5 is not None:
            ds = self._h5[name]
            return tuple(d.label or "" for d in ds.dims)
        return tuple(self._nc3.variables[name].dimensions)

    # -- reading ------------------------------------------------------------
    def read(self, name: str, dtype=None) -> np.ndarray:
        """Read a variable as a numpy array in stored (C) order."""
        if self._h5 is not None:
            if name not in self._h5:
                raise KeyError(f"{self.path}: no variable {name!r}")
            arr = np.asarray(self._h5[name][...])
        else:
            if name not in self._nc3.variables:
                raise KeyError(f"{self.path}: no variable {name!r}")
            var = self._nc3.variables[name]
            arr = np.array(var[...])  # copy out of mmap
        if dtype is not None and arr.dtype != dtype:
            arr = arr.astype(dtype)
        return arr

    def read_strings(self, name: str) -> list[str]:
        """Read a char-array or string variable as a list of python strings.

        Handles the reference's ``(n, string_len)`` char layout
        (``nn_activation_char``, ``nn_inputs_char``) and variable-length
        HDF5 strings (``nn_activation``).
        """
        if self._h5 is not None and name in self._h5:
            ds = self._h5[name]
            arr = ds[...]
        elif self._nc3 is not None and name in self._nc3.variables:
            arr = np.array(self._nc3.variables[name][...])
        else:
            raise KeyError(f"{self.path}: no variable {name!r}")

        def _decode(x) -> str:
            if isinstance(x, bytes):
                return x.decode("utf-8", "ignore").strip().strip("\x00").strip()
            return str(x).strip()

        if arr.dtype.kind == "O" or arr.dtype.kind == "U":
            return [_decode(x) for x in arr.ravel()]
        if arr.dtype.kind == "S" and arr.dtype.itemsize > 1:
            return [_decode(x) for x in arr.ravel()]
        # (n, string_len) array of single chars
        if arr.ndim == 2 and arr.dtype.kind in ("S", "U"):
            out = []
            for row in arr:
                chars = [c.decode("utf-8", "ignore") if isinstance(c, bytes) else str(c) for c in row]
                out.append("".join(chars).strip().strip("\x00").strip())
            return out
        raise ValueError(f"{name}: cannot decode dtype {arr.dtype} shape {arr.shape} as strings")


def _h5dataset():
    import h5py

    return h5py.Dataset


def read_all(path: str, names: Sequence[str] | None = None) -> dict[str, np.ndarray]:
    with NCFile(path) as f:
        names = names if names is not None else f.variables()
        return {n: f.read(n) for n in names}


# -- writing (netCDF-3 classic via scipy) -----------------------------------

def write_nc(
    path: str,
    dims: Mapping[str, int],
    variables: Mapping[str, tuple[Sequence[str], Any]],
    attrs: Mapping[str, Any] | None = None,
) -> None:
    """Write a netCDF-3 classic file.

    variables maps name -> (dim-name tuple, array). Char data must be passed
    as ``np.array(..., dtype='S1')`` 2-D arrays with matching dims.
    """
    from scipy.io import netcdf_file

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with netcdf_file(path, "w") as f:
        for name, size in dims.items():
            f.createDimension(name, int(size))
        for name, (vdims, data) in variables.items():
            # the array's dtype is stored as given: callers casting to
            # float64 (col_dry, pres_level, regression goldens) keep the
            # precision, callers wanting float32 files cast themselves (a
            # prior silent finite-f64 -> f32 downcast defeated both)
            data = np.asarray(data)
            var = f.createVariable(name, data.dtype, tuple(vdims))
            var[...] = data
        if attrs:
            for k, v in attrs.items():
                setattr(f, k, v)


def strings_to_chararray(strings: Sequence[str], width: int) -> np.ndarray:
    """Encode python strings as an (n, width) 'S1' char array, the reference's
    netCDF string layout (ml_load_save_preproc.py save_model_netcdf)."""
    out = np.full((len(strings), width), b" ", dtype="S1")
    for i, s in enumerate(strings):
        b = s.encode()[:width]
        out[i, : len(b)] = np.frombuffer(b, dtype="S1")
    return out
