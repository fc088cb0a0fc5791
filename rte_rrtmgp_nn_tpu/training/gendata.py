"""Training-data generation: run the LUT gas optics + solver over an
RFMIP-style file and save NN inputs/targets.

Reference parity: ``examples/rrtmgp-nn-training/rrtmgp_lw_gendata_rfmipstyle
.F90`` / ``rrtmgp_sw_gendata_rfmipstyle.F90`` -- saves the packed NN input
features (``rrtmgp_lw_input``), per-g-point targets (``tau_lw_gas``,
``planck_fraction`` captured via sources%planck_frac), ``col_dry``,
level fluxes (rsu/rsd) and ``pres_level``, in a netCDF read back by the
training loader (ml_load_save_preproc.load_rrtmgp:173-280).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..drivers.rfmip_io import RFMIPData
from ..fluxes import reduce_broadband
from ..gasoptics.kdist import KDist
from ..gasoptics.lut_gas_optics import gas_optics_lw_lut, gas_optics_sw_lut
from ..gasoptics.nn_gas_optics import get_col_dry
from ..rte import rte_lw, rte_sw
from ..utils import ncio

# Feature packing identical to the NN input convention (tlay, log play,
# h2o^1/4, o3^1/4, then raw vmrs) -- reference compute_nn_inputs, but
# UNSCALED (scaling coefficients are chosen at training time).
def pack_features(play, tlay, gas_desc, gas_order: Sequence[str]):
    ncol, nlay = play.shape
    feats = [tlay, jnp.log(play)]
    for g in gas_order:
        v = gas_desc.get_vmr(g, ncol, nlay)
        if g in ("h2o", "o3"):
            v = jnp.sqrt(jnp.sqrt(v))
        feats.append(v)
    return jnp.stack(feats, axis=-1)  # (ncol, nlay, nfeat)


def generate_lw_training_data(
    out_path: str,
    kd: KDist,
    data: RFMIPData,
    gas_order: Optional[Sequence[str]] = None,
    save_input_vectors: bool = True,
) -> dict:
    """Run the LW LUT path with pfrac capture over all columns and write the
    training netCDF. Returns the in-memory arrays as a dict as well."""
    gas_order = list(gas_order or kd.gas_names)
    ncol, nlay = data.play.shape
    play = jnp.asarray(data.play)
    plev = jnp.asarray(data.plev)
    tlay = jnp.asarray(data.tlay)
    tlev = jnp.asarray(data.tlev)
    tsfc = jnp.asarray(data.tsfc)

    col_dry = get_col_dry(data.gas_concs.get_vmr("h2o", ncol, nlay), plev)
    props, sources = gas_optics_lw_lut(
        kd, play, plev, tlay, tsfc, data.gas_concs, col_dry=col_dry, tlev=tlev,
        top_at_1=data.top_at_1, save_pfrac=True,
    )
    emis = jnp.broadcast_to(jnp.asarray(data.sfc_emis)[:, None], (ncol, kd.nband))
    sol = rte_lw(props, data.top_at_1, sources, emis)
    fb = reduce_broadband(sol.flux_up, sol.flux_dn)

    x = pack_features(play, tlay, data.gas_concs, gas_order)
    nexp, nsite = data.nexp, data.nsites

    def blk(a, *shape):
        return np.asarray(a).reshape(nexp, nsite, *shape)

    out = {
        "rrtmgp_lw_input": blk(x, nlay, x.shape[-1]),
        "tau_lw_gas": blk(props.tau, nlay, kd.ngpt),
        "planck_fraction": blk(sources.planck_frac, nlay, kd.ngpt),
        "col_dry": blk(col_dry, nlay),
        "rsu": blk(fb.flux_up, nlay + 1),
        "rsd": blk(fb.flux_dn, nlay + 1),
        "pres_level": blk(plev, nlay + 1),
    }

    dims = {
        "expt": nexp, "site": nsite, "layer": nlay, "level": nlay + 1,
        "feature": x.shape[-1], "gpt": kd.ngpt,
    }
    variables = {
        "pres_level": (("expt", "site", "level"), out["pres_level"].astype(np.float64)),
        "rsu": (("expt", "site", "level"), out["rsu"].astype(np.float32)),
        "rsd": (("expt", "site", "level"), out["rsd"].astype(np.float32)),
        "rrtmgp_lw_input": (("expt", "site", "layer", "feature"), out["rrtmgp_lw_input"].astype(np.float32)),
        "col_dry": (("expt", "site", "layer"), out["col_dry"].astype(np.float64)),
    }
    if save_input_vectors:
        variables["tau_lw_gas"] = (("expt", "site", "layer", "gpt"), out["tau_lw_gas"].astype(np.float32))
        variables["planck_fraction"] = (("expt", "site", "layer", "gpt"), out["planck_fraction"].astype(np.float32))
    ncio.write_nc(out_path, dims, variables, attrs={"features": " ".join(["tlay", "play"] + list(gas_order))})
    return out


def generate_sw_training_data(
    out_path: str,
    kd: KDist,
    data: RFMIPData,
    gas_order: Optional[Sequence[str]] = None,
    save_input_vectors: bool = True,
) -> dict:
    """SW analogue (reference rrtmgp_sw_gendata_rfmipstyle.F90): saves
    tau_sw_gas (total tau) and ssa_sw_gas, from which the training targets
    are tau_abs = tau*(1-ssa) and tau_ray = tau*ssa (the y_rayleigh =
    tau*ssa/N note at :12), plus fluxes rsu/rsd/rsd_dir."""
    import numpy as np

    gas_order = list(gas_order or kd.gas_names)
    ncol, nlay = data.play.shape
    play = jnp.asarray(data.play)
    plev = jnp.asarray(data.plev)
    tlay = jnp.asarray(data.tlay)

    col_dry = get_col_dry(data.gas_concs.get_vmr("h2o", ncol, nlay), plev)
    props, src = gas_optics_sw_lut(kd, play, plev, tlay, data.gas_concs, col_dry=col_dry)
    mu0 = jnp.asarray(np.clip(np.cos(np.deg2rad(data.sza)), 0.01, 1.0), play.dtype)
    alb = jnp.broadcast_to(jnp.asarray(data.sfc_alb, play.dtype)[:, None], (ncol, kd.ngpt))
    sol = rte_sw(props, data.top_at_1, mu0, src.toa_source, alb, alb)
    fb = reduce_broadband(sol.flux_up, sol.flux_dn, gpt_flux_dn_dir=sol.flux_dn_dir)

    x = pack_features(play, tlay, data.gas_concs, gas_order)
    nexp, nsite = data.nexp, data.nsites

    def blk(a, *shape):
        return np.asarray(a).reshape(nexp, nsite, *shape)

    out = {
        "rrtmgp_sw_input": blk(x, nlay, x.shape[-1]),
        "tau_sw_gas": blk(props.tau, nlay, kd.ngpt),
        "ssa_sw_gas": blk(props.ssa, nlay, kd.ngpt),
        "col_dry": blk(col_dry, nlay),
        "rsu": blk(fb.flux_up, nlay + 1),
        "rsd": blk(fb.flux_dn, nlay + 1),
        "rsd_dir": blk(fb.flux_dn_dir, nlay + 1),
        "pres_level": blk(plev, nlay + 1),
    }
    dims = {
        "expt": nexp, "site": nsite, "layer": nlay, "level": nlay + 1,
        "feature": x.shape[-1], "gpt": kd.ngpt,
    }
    variables = {
        "pres_level": (("expt", "site", "level"), out["pres_level"].astype(np.float64)),
        "rsu": (("expt", "site", "level"), out["rsu"].astype(np.float32)),
        "rsd": (("expt", "site", "level"), out["rsd"].astype(np.float32)),
        "rsd_dir": (("expt", "site", "level"), out["rsd_dir"].astype(np.float32)),
        "rrtmgp_sw_input": (("expt", "site", "layer", "feature"), out["rrtmgp_sw_input"].astype(np.float32)),
        "col_dry": (("expt", "site", "layer"), out["col_dry"].astype(np.float64)),
    }
    if save_input_vectors:
        variables["tau_sw_gas"] = (("expt", "site", "layer", "gpt"), out["tau_sw_gas"].astype(np.float32))
        variables["ssa_sw_gas"] = (("expt", "site", "layer", "gpt"), out["ssa_sw_gas"].astype(np.float32))
    ncio.write_nc(out_path, dims, variables, attrs={"features": " ".join(["tlay", "play"] + list(gas_order))})
    return out


def load_training_data(path: str, predictand: str = "lw_absorption"):
    """Read a gendata file back into (x, y, col_dry) training arrays
    (reference load_rrtmgp, all predictand modes of ml_train.py:188-195:
    lw_absorption, lw_planck_frac, lw_both, sw_absorption, sw_rayleigh)."""
    with ncio.NCFile(path) as f:
        col_dry = f.read("col_dry", np.float64)
        if predictand == "lw_absorption":
            x = f.read("rrtmgp_lw_input", np.float32)
            y = f.read("tau_lw_gas", np.float32)
        elif predictand == "lw_planck_frac":
            x = f.read("rrtmgp_lw_input", np.float32)
            y = f.read("planck_fraction", np.float32)
        elif predictand == "lw_both":
            x = f.read("rrtmgp_lw_input", np.float32)
            y = np.concatenate(
                [f.read("tau_lw_gas", np.float32), f.read("planck_fraction", np.float32)],
                axis=-1,
            )
        elif predictand in ("sw_absorption", "sw_rayleigh"):
            x = f.read("rrtmgp_sw_input", np.float32)
            tau = f.read("tau_sw_gas", np.float64)
            ssa = f.read("ssa_sw_gas", np.float64)
            y = (tau * (1.0 - ssa) if predictand == "sw_absorption" else tau * ssa).astype(
                np.float32
            )
        else:
            raise ValueError(f"unknown predictand {predictand!r}")
    return (
        x.reshape(-1, x.shape[-1]),
        y.reshape(-1, y.shape[-1]),
        col_dry.reshape(-1),
    )
