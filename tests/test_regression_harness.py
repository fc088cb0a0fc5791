"""The clear-sky regression harness end-to-end (reference
clear_sky_regression.F90 + verification.py in one flow)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_nn_tpu.drivers.clear_sky_regression import (
    run_lw_variants,
    run_sw_variants,
    verify_variants,
    write_fields,
)
from rte_rrtmgp_nn_tpu.gasoptics.kdist import load_kdist
from rte_rrtmgp_nn_tpu.gasoptics.synthetic import generate_kdist_nc
from rte_rrtmgp_nn_tpu.training.gendata import generate_sw_training_data, load_training_data

from test_lut_gas_optics import GASES, make_atmosphere
from test_training import mini_rfmip  # fixture


@pytest.fixture(scope="module")
def kds(tmp_path_factory):
    d = tmp_path_factory.mktemp("kd")
    plw, psw = str(d / "lw.nc"), str(d / "sw.nc")
    generate_kdist_nc(plw, kind="lw", gpts_per_band=4, nband=16)
    generate_kdist_nc(psw, kind="sw", gpts_per_band=4, nband=14)
    return load_kdist(plw, GASES), load_kdist(psw, GASES)


def test_lw_sw_variants_and_verification(kds, tmp_path):
    kd_lw, kd_sw = kds
    play, plev, tlay, tlev, tsfc, gc = make_atmosphere(ncol=6, nlay=14)
    emis = jnp.full((6, kd_lw.nband), 0.97, play.dtype)
    fields = run_lw_variants(kd_lw, play, plev, tlay, tlev, tsfc, gc, emis)
    mu0 = jnp.full((6,), 0.7, play.dtype)
    alb = jnp.full((6, kd_sw.nband), 0.12, play.dtype)
    fields.update(run_sw_variants(kd_sw, play, plev, tlay, gc, mu0, alb))

    checks = verify_variants(fields)
    # core invariants at machine precision
    for tight in ("lw_vr", "lw_subset", "lw_inc1scl", "lw_inc2str", "sw_vr", "sw_tsi"):
        assert checks[tight] < 1e-5, (tight, checks[tight])
    assert "lw_flux_up_3ang" in fields and "lw_flux_up_optang" in fields

    p = str(tmp_path / "test_atmospheres.nc")
    write_fields(p, fields)
    from rte_rrtmgp_nn_tpu.utils import ncio

    with ncio.NCFile(p) as f:
        assert f.has_var("lw_flux_up_vr") and f.has_var("sw_flux_dir")


def test_sw_gendata_roundtrip(kds, mini_rfmip, tmp_path):
    _, kd_sw = kds
    p = str(tmp_path / "sw_train.nc")
    out = generate_sw_training_data(p, kd_sw, mini_rfmip)
    assert out["tau_sw_gas"].shape[-1] == kd_sw.ngpt
    x, y_abs, cd = load_training_data(p, "sw_absorption")
    x2, y_ray, _ = load_training_data(p, "sw_rayleigh")
    assert x.shape == x2.shape and y_abs.shape == y_ray.shape
    # abs + ray == total tau
    tau_tot = out["tau_sw_gas"].reshape(-1, kd_sw.ngpt)
    np.testing.assert_allclose(y_abs + y_ray, tau_tot, rtol=1e-5, atol=1e-7)
    assert np.all(y_ray >= -1e-8)
