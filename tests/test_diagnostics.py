"""Visual ML-eval diagnostics (training/diagnostics.py): figure set and
scalar stats mirror reference ml_eval_funcs.py semantics."""
import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from rte_rrtmgp_nn_tpu.training.diagnostics import (  # noqa: E402
    heating_rate_stats,
    plot_flux_and_hr_error,
    plot_heating_rate_error,
    plot_hist2d,
    plot_hist2d_reftrans,
    plot_hist2d_tau,
    plot_hist2d_transmittance,
    save_eval_figures,
)


@pytest.fixture
def flux_profiles(rng):
    n, nlev = 40, 61
    plev = np.linspace(100.0, 1e5, nlev)[None, :] * np.ones((n, 1))
    up = 200.0 + np.cumsum(rng.uniform(0, 2, (n, nlev)), axis=1)
    dn = 50.0 + np.cumsum(rng.uniform(0, 4, (n, nlev)), axis=1)
    up_p = up + rng.normal(0, 0.5, up.shape)
    dn_p = dn + rng.normal(0, 0.5, dn.shape)
    return up, dn, up_p, dn_p, plev


def test_heating_rate_stats_exact(rng):
    t = rng.normal(1.0, 0.5, (100, 60))
    p = t + rng.normal(0, 0.1, t.shape)
    s = heating_rate_stats(t, p)
    np.testing.assert_allclose(s["mae"], np.mean(np.abs(p - t)), rtol=1e-12)
    np.testing.assert_allclose(s["bias"], np.mean(p - t), rtol=1e-9)
    np.testing.assert_allclose(
        s["rmse"], np.sqrt(np.mean((p - t) ** 2)), rtol=1e-12)
    r = np.corrcoef(p.ravel(), t.ravel())[0, 1]
    np.testing.assert_allclose(s["r2"], r * r, rtol=1e-12)
    assert len(s["text"]) == 4  # the reference's four annotation lines


def test_profile_figures(flux_profiles):
    up, dn, up_p, dn_p, plev = flux_profiles
    from rte_rrtmgp_nn_tpu.extensions.heating_rates import (
        compute_heating_rate_kday,
    )

    hr_t = np.asarray(compute_heating_rate_kday(up, dn, plev))
    hr_p = np.asarray(compute_heating_rate_kday(up_p, dn_p, plev))
    fig = plot_heating_rate_error(hr_t, hr_p, plev)
    assert len(fig.axes) == 1
    assert fig.axes[0].get_ylim()[0] > fig.axes[0].get_ylim()[1]  # inverted

    fig = plot_flux_and_hr_error(up, dn, up_p, dn_p, plev)
    assert len(fig.axes) == 3
    # every panel drew one error profile line
    assert all(len(a.lines) == 1 for a in fig.axes)


def test_hist2d_variants(rng):
    tau = rng.lognormal(-2, 2, (500, 16))
    tau_p = tau * np.exp(rng.normal(0, 0.05, tau.shape))
    fig = plot_hist2d_tau(tau, tau_p, nbins=30)
    assert fig.axes[0].get_xlabel() == "Optical depth"
    fig = plot_hist2d_transmittance(tau, tau_p, nbins=30)
    assert fig.axes[0].get_xlabel() == "Transmittance"
    # auto-detection: values in [0, 1] label as transmittance
    fig = plot_hist2d(np.exp(-tau), np.exp(-tau_p), nbins=30)
    assert fig.axes[0].get_xlabel() == "Transmittance"
    # square identity-line plot
    ax = fig.axes[0]
    assert ax.get_xlim() == ax.get_ylim()

    rt = rng.uniform(0, 1, (500, 4))
    rt_p = np.clip(rt + rng.normal(0, 0.02, rt.shape), 0, 1)
    fig = plot_hist2d_reftrans(rt, rt_p, nbins=20)
    labels = [a.get_xlabel() for a in fig.axes if a.get_xlabel()]
    assert labels[:4] == ["Rdif", "Tdif", "Rdir", "Tdir"]


def test_save_eval_figures(flux_profiles, tmp_path):
    import os

    up, dn, up_p, dn_p, plev = flux_profiles
    paths = save_eval_figures(tmp_path, up, dn, up_p, dn_p, plev,
                              prefix="demo")
    assert len(paths) == 2
    assert all(os.path.getsize(p) > 1000 for p in paths)
