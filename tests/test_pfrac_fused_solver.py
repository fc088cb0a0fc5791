"""The pfrac-fused LW variant must match the standard pipeline exactly."""
import jax.numpy as jnp
import numpy as np

from rte_rrtmgp_nn_tpu.gasoptics.planck import PlanckTable, lw_spectral_g128, compute_planck_source_nn
from rte_rrtmgp_nn_tpu.ops.lw_solver import lw_noscat_broadband_from_pfrac, lw_solver_noscat


def test_pfrac_fused_matches_pipeline(rng):
    spec = lw_spectral_g128()
    table = PlanckTable.compute(spec.band_lims_wvn_array, dtype=jnp.float64)
    ncol, nlay, ngpt = 3, 8, 128
    tau = jnp.asarray(rng.uniform(0.05, 2.0, (ncol, nlay, ngpt)))
    pfrac_raw = jnp.asarray(rng.uniform(0.01, 1.0, (ncol, nlay, ngpt)))
    # normalize per band so pfrac is a valid fraction field
    pfrac = pfrac_raw / spec.expand(spec.reduce_sum(pfrac_raw))
    tlay = jnp.asarray(rng.uniform(220, 300, (ncol, nlay)))
    tlev = jnp.asarray(rng.uniform(220, 300, (ncol, nlay + 1)))
    tsfc = jnp.asarray(rng.uniform(280, 300, (ncol,)))
    emis_g = jnp.asarray(rng.uniform(0.9, 1.0, (ncol, ngpt)))

    lay, lev, sfc, sfc_jac = compute_planck_source_nn(pfrac, tlay, tlev, tsfc, spec, table)
    ref = lw_solver_noscat(tau, lay, lev, emis_g, sfc, sfc_source_jac=sfc_jac, broadband=True)

    one_hot = jnp.asarray(
        (spec.gpt2band[None, :] == np.arange(spec.nband)[:, None]).astype(np.float64)
    )
    fused = lw_noscat_broadband_from_pfrac(
        tau, pfrac,
        table.interpolate(tlay), table.interpolate(tlev),
        table.interpolate(tsfc), table.interpolate(tsfc + 1.0),
        one_hot, emis_g, compute_jac=True,
    )
    np.testing.assert_allclose(np.asarray(fused.flux_up), np.asarray(ref.flux_up), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.flux_dn), np.asarray(ref.flux_dn), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.flux_up_jac), np.asarray(ref.flux_up_jac), rtol=1e-9)
