"""All-sky (clouds + gases) example driver.

Reference parity: ``examples/all-sky/rrtmgp_allsky.F90`` -- Garand
atmosphere replicated to ncol columns; idealized cloud placement (clouds in
2/3 of columns, between 100 and 900 hPa, liquid where T > 263 K and ice
where T < 273 K, lwp = iwp = 10 g/m2, effective radii at the middle of the
valid range; :329-350); cloud optics -> (SW) delta-scale -> increment into
the gas optical props -> solver; ocean-ish SW albedo 0.06, mu0 = 0.86,
LW emissivity 0.98 (:280-304).

Gas optics here uses the NN path (the reference example uses the LUT path;
its k-distribution file is not shipped). Reference smoke values from the
LUT path (mean LW dn/up 144.14/269.76, SW dn/up 946.98/325.29;
rrtmgp_allsky.F90:479,487) remain the comparison target at NN accuracy.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import resolve_use_megakernel
from ..fluxes import FluxesBroadband, reduce_broadband
from ..gas_concs import GasConcs
from ..gasoptics.nn_gas_optics import gas_optics_lw_nn, gas_optics_sw_nn
from ..gasoptics.planck import PlanckTable, lw_spectral_g128, sw_spectral_g112
from ..models.network import NNModel
from ..optical_props import OpticalProps1scl, OpticalProps2str, delta_scale, increment
from ..rte import rte_lw, rte_sw
from ..spectral import SpectralMapping
from .allsky_io import GarandAtmosphere  # noqa: F401 (re-export)
from .allsky_io import read_garand
from .rfmip import default_solar_source, resolve_solar_source
from ..extensions.cloud_optics import CloudOptics, cloud_optics

# Regime threshold for the all-sky LW megakernel (ncol below it takes the
# staged core even when megakernels are on). Round-4 history: the staged
# core won below ~2270 columns (3.16 vs 3.51 ms at 1800) UNTIL the trace
# showed that loss was XLA mis-scheduling the 26-lane fused input into
# per-lane tile-padded relayouts + a 13.3 ms concat; with the explicit
# stack assembly (lw_clearsky_mega4 assembly="stack") the megakernel wins
# every regime (2.03 vs 3.16 ms at 1800; 13.1 vs ~26 ms LW at 28.8k), so
# the threshold is 0. The plumbing + tests stay: if a future kernel
# change resurrects a small-batch staged win, measure and raise it.
ALLSKY_LW_MEGA_MIN_NCOL = 0

# Idealized cloud-placement thresholds (reference rrtmgp_allsky.F90:329-350).
# Exported so the mixed-precision GCM packer can keep quantized play/tlay on
# the same side of each hard branch (drivers/gcm._pack_columns_mixed).
CLOUD_P_MIN = 100.0 * 100.0   # Pa
CLOUD_P_MAX = 900.0 * 100.0   # Pa
CLOUD_T_LIQ = 263.0           # K: liquid where tlay > this
CLOUD_T_ICE = 273.0           # K: ice where tlay < this


def make_clouds(play, tlay, co: CloudOptics, cloud_col=None):
    """Idealized cloud fields (reference rrtmgp_allsky.F90:329-350).

    Works on host numpy arrays or device (jit-traced) arrays. ``cloud_col``
    optionally supplies the per-column "2/3 of columns are cloudy" mask
    (truthy = may hold cloud); streamed drivers pass the GLOBAL-index mask
    so block decomposition does not change which columns are cloudy."""
    xp = jnp if isinstance(play, jax.Array) else np
    ncol, nlay = play.shape
    if cloud_col is None:
        icol = xp.arange(ncol)[:, None] + 1  # 1-based like the reference
        cloud_col = (icol % 3) != 0
    else:
        cloud_col = (cloud_col > 0.5)
        if cloud_col.ndim == 1:
            cloud_col = cloud_col[:, None]
    cloud_mask = (play > CLOUD_P_MIN) & (play < CLOUD_P_MAX) & cloud_col
    rel_val = 0.5 * (co.min_radius_liq + co.max_radius_liq)
    rei_val = 0.5 * (co.min_radius_ice + co.max_radius_ice)
    lwp = xp.where(cloud_mask & (tlay > CLOUD_T_LIQ), 10.0, 0.0)
    iwp = xp.where(cloud_mask & (tlay < CLOUD_T_ICE), 10.0, 0.0)
    rel = xp.where(lwp > 0.0, rel_val, 0.0)
    rei = xp.where(iwp > 0.0, rei_val, 0.0)
    return lwp, iwp, rel, rei


def _allsky_lw_core(
    models, table, spectral, cloud_co,
    play, plev, tlay, tlev, tsfc, emis_band, lwp, iwp, rel, rei, concs,
    top_at_1, n_gauss_angles, scan_mode,
):
    gas_desc = GasConcs(concs)
    tau, sources = gas_optics_lw_nn(
        models, play, plev, tlay, tsfc, gas_desc, spectral, table,
        tlev=tlev, top_at_1=top_at_1,
    )
    atmos = OpticalProps1scl(tau, spectral)
    clouds = cloud_optics(cloud_co, lwp, iwp, rel, rei, as_2str=False)
    atmos = increment(atmos, clouds)  # by-band broadcast add (1scl += 1scl)
    sol = rte_lw(atmos, top_at_1, sources, emis_band,
                 n_gauss_angles=n_gauss_angles, scan_mode=scan_mode)
    return reduce_broadband(sol.flux_up, sol.flux_dn)


def _allsky_sw_core(
    models, spectral, solar, cloud_co,
    play, plev, tlay, mu0, sfc_alb_dir, sfc_alb_dif, lwp, iwp, rel, rei, concs,
    top_at_1, scan_mode,
):
    gas_desc = GasConcs(concs)
    tau, ssa, toa_src = gas_optics_sw_nn(
        models, play, plev, tlay, gas_desc, spectral, solar
    )
    atmos = OpticalProps2str(tau, ssa, jnp.zeros_like(tau), spectral)
    clouds = cloud_optics(cloud_co, lwp, iwp, rel, rei, as_2str=True)
    clouds = delta_scale(clouds)  # reference: clouds%delta_scale() before increment
    atmos = increment(atmos, clouds)
    alb_dir = spectral.expand(sfc_alb_dir)
    alb_dif = spectral.expand(sfc_alb_dif)
    sol = rte_sw(atmos, top_at_1, mu0, toa_src, alb_dir, alb_dif, scan_mode=scan_mode)
    return reduce_broadband(sol.flux_up, sol.flux_dn, gpt_flux_dn_dir=sol.flux_dn_dir)


def _flip_all(top_at_1, *arrs):
    return arrs if top_at_1 else tuple(a[:, ::-1] for a in arrs)


def _allsky_lw_core_lay_major(
    models, table, spectral, cloud_co,
    play, plev, tlay, tlev, tsfc, emis_band, lwp, iwp, rel, rei, concs,
    top_at_1,
):
    """Layer-major all-sky LW core: the cloud absorption tau is expanded
    band->gpt (one-hot matmul) and folded into the gas tau BEFORE the
    broadband solve, so the in-scan spectral reduction survives clouds
    (the generic path re-materializes gpt-resolved incremented props).
    Numerics identical to _allsky_lw_core (same increment formula:
    1scl += (1-ssa)*tau is trivial here since as_2str=False already
    returns absorption tau)."""
    from ..gasoptics.nn_gas_optics import (
        compute_nn_inputs,
        get_col_dry,
        predict_nn_lw,
    )
    from ..gasoptics.planck import compute_planck_source_nn
    from ..ops.lw_solver import lw_solver_noscat_lay_major

    gas_desc = GasConcs(concs)
    ncol, nlay = play.shape
    play, plev, tlay, tlev, lwp, iwp, rel, rei = _flip_all(
        top_at_1, play, plev, tlay, tlev, lwp, iwp, rel, rei)
    concs_t = {}
    for name in gas_desc.concs:
        full = gas_desc.get_vmr(name, ncol, nlay)
        if not top_at_1:
            full = full[:, ::-1]
        concs_t[name] = full.T
    gd_t = GasConcs(concs_t)

    col_dry_t = get_col_dry(gd_t.get_vmr("h2o", nlay, ncol).T, plev).T
    x = compute_nn_inputs(play.T, tlay.T, gd_t, models[0])
    tau, pfrac = predict_nn_lw(models, x, col_dry_t)
    lay_src, lev_src, sfc_src, _ = compute_planck_source_nn(
        pfrac, tlay.T, tlev.T, tsfc, spectral, table,
        top_at_1=True, lay_axis=0,
    )
    cld = cloud_optics(cloud_co, lwp.T, iwp.T, rel.T, rei.T, as_2str=False)
    tau = tau + spectral.expand(cld.tau)
    emis = spectral.expand(emis_band)
    sol = lw_solver_noscat_lay_major(tau, lay_src, lev_src, emis, sfc_src)
    up, dn = sol.flux_up, sol.flux_dn
    if not top_at_1:
        up, dn = up[:, ::-1], dn[:, ::-1]
    return FluxesBroadband(flux_up=up, flux_dn=dn, flux_net=dn - up)


def _allsky_sw_core_lay_major(
    models, spectral, solar, cloud_co,
    play, plev, tlay, mu0, sfc_alb_dir, sfc_alb_dif, lwp, iwp, rel, rei,
    concs,
    top_at_1,
):
    """Layer-major all-sky SW core: delta-scaled cloud 2-stream props are
    combined with the (g=0) gas props analytically in the g-point domain
    before the broadband solve (inc_2stream_by_2stream_bybnd,
    mo_optical_props_kernels.F90:269-305, with tau_gas*0 asymmetry terms
    dropped). Numerics identical to _allsky_sw_core."""
    from ..gasoptics.nn_gas_optics import (
        compute_nn_inputs,
        get_col_dry,
        predict_nn_sw,
    )
    from ..ops.sw_solver import sw_solver_2stream_lay_major

    gas_desc = GasConcs(concs)
    ncol, nlay = play.shape
    play, plev, tlay, lwp, iwp, rel, rei = _flip_all(
        top_at_1, play, plev, tlay, lwp, iwp, rel, rei)
    concs_t = {}
    for name in gas_desc.concs:
        full = gas_desc.get_vmr(name, ncol, nlay)
        if not top_at_1:
            full = full[:, ::-1]
        concs_t[name] = full.T
    gd_t = GasConcs(concs_t)

    col_dry_t = get_col_dry(gd_t.get_vmr("h2o", nlay, ncol).T, plev).T
    x = compute_nn_inputs(play.T, tlay.T, gd_t, models[0])
    tau, ssa = predict_nn_sw(models, x, col_dry_t)  # gas: g = 0

    cld = cloud_optics(cloud_co, lwp.T, iwp.T, rel.T, rei.T, as_2str=True)
    cld = delta_scale(cld)
    eps = jnp.finfo(tau.dtype).eps
    tau_c = spectral.expand(cld.tau)
    ssa_c = spectral.expand(cld.ssa)
    g_c = spectral.expand(cld.g)
    tau12 = tau + tau_c
    tauscat12 = tau * ssa + tau_c * ssa_c
    g12 = (tau_c * ssa_c * g_c) / jnp.maximum(eps, tauscat12)
    ssa12 = tauscat12 / jnp.maximum(eps, tau12)

    toa_src = jnp.broadcast_to(solar[None, :], (ncol, spectral.ngpt))
    alb_dir = spectral.expand(sfc_alb_dir)
    alb_dif = spectral.expand(sfc_alb_dif)
    sol = sw_solver_2stream_lay_major(
        tau12, ssa12, g12, mu0, toa_src, alb_dir, alb_dif)
    up, dn, dn_dir = sol.flux_up, sol.flux_dn, sol.flux_dn_dir
    if not top_at_1:
        up, dn, dn_dir = up[:, ::-1], dn[:, ::-1], dn_dir[:, ::-1]
    return FluxesBroadband(
        flux_up=up, flux_dn=dn, flux_net=dn - up, flux_dn_dir=dn_dir)


def canonicalize_allsky_inputs(
    play, plev, tlay, tlev, lwp, iwp, rel, rei, gas_concs, top_at_1,
    dtype=np.float32,
):
    """Host-side layout canonicalization for the megakernel cores: every
    (ncol, nlay[+1]) field becomes (nlay[+1], ncol) top-at-0 contiguous
    numpy, and every gas VMR is materialized to full lay-major 2-D. The
    flips/transposes run ONCE in numpy so the jitted cores do ZERO layout
    copies on device (~1 ms of the all-sky device time at 1800 cols)."""
    def canon(a):
        a = np.asarray(a, dtype)
        if not top_at_1:
            a = a[:, ::-1]
        return np.ascontiguousarray(a.T)

    ncol, nlay = np.asarray(play).shape
    fields = tuple(canon(a) for a in (play, plev, tlay, tlev,
                                      lwp, iwp, rel, rei))
    concs_t = {
        name: canon(gas_concs.get_vmr(name, ncol, nlay))
        for name in gas_concs.concs
    }
    return fields, concs_t


def _allsky_lw_core_mega(
    models, table, spectral, cloud_co,
    play_t, plev_t, tlay_t, tlev_t, tsfc, emis_band,
    lwp_t, iwp_t, rel_t, rei_t, concs_t,
    top_at_1, tile_c: int | None = None,
):
    """All-sky LW through the fused mega4 kernel: the band-resolved cloud
    absorption tau rides nband extra input lanes and folds into the gas tau
    in-kernel (lw_clearsky_mega4 cld_tau_band) -- no (nlay, ncol, ngpt)
    staging at all. Inputs are CANONICAL lay-major top-at-0
    (canonicalize_allsky_inputs); top_at_1 only flips the output fluxes
    back to the caller's level order. Numerics match
    _allsky_lw_core_lay_major (reference rrtmgp_allsky.F90 LW branch)."""
    import numpy as np

    from ..gasoptics.nn_gas_optics import (
        compute_nn_inputs_split,
        get_col_dry_lay_major,
    )
    from ..ops.pallas.lw_megakernel import lw_clearsky_mega4, pick_tile_c

    gas_desc = GasConcs(concs_t)
    nlay, ncol = play_t.shape
    if tile_c is None:
        # prefer a DIVIDING tile (r5s3: 0.732 @32 -> 0.702 @72 at 1800
        # cols, bit-identical; 28.8k keeps 32)
        tile_c = pick_tile_c(ncol, 32, (72, 48, 40, 24, 16, 8))
    col_dry = get_col_dry_lay_major(
        gas_desc.get_vmr("h2o", nlay, ncol), plev_t)
    x2d, const_feats, perm = compute_nn_inputs_split(
        play_t, tlay_t, gas_desc, models[0], (), lay_major=True)
    n2d = len(x2d)
    w1 = models[0].weights[0]
    w1a = w1[np.asarray(perm[:n2d])]
    w1c = (w1[np.asarray(perm[n2d:])] if len(perm) > n2d
           else jnp.zeros((1, w1.shape[1]), w1.dtype))
    one_hot = jnp.asarray(
        (spectral.gpt2band[None, :] == np.arange(spectral.nband)[:, None]),
        x2d[0].dtype,
    )
    emis = spectral.expand(emis_band)
    if cloud_co.is_lut:
        # LUT cloud optics runs fully IN-KERNEL: 4 physical lanes instead
        # of nband tau lanes, no XLA cloud stage at all. assembly="stack":
        # XLA mis-schedules this 26-lane fused input into per-lane
        # tile-padded relayouts + a 13.3 ms concat (round-4 trace, 28.8k
        # cols; 35.9 -> ~13 ms with the explicit stack assembly).
        from ..ops.pallas.lw_megakernel import cloud_lut_pack

        cld_kw = dict(cld_fields=(lwp_t, iwp_t, rel_t, rei_t),
                      cld_lut=cloud_lut_pack(cloud_co), assembly="stack")
    else:  # Pade coefficients: band tau computed in XLA, folded in-kernel
        cld = cloud_optics(cloud_co, lwp_t, iwp_t, rel_t, rei_t,
                           as_2str=False)
        cld_kw = dict(cld_tau_band=cld.tau)
    up, dn = lw_clearsky_mega4(
        models[0], x2d, const_feats, w1a, w1c, col_dry,
        tlay_t, tlev_t, tsfc, table, one_hot, emis, tile_c=tile_c,
        **cld_kw,
    )
    if not top_at_1:
        up, dn = up[:, ::-1], dn[:, ::-1]
    return FluxesBroadband(flux_up=up, flux_dn=dn, flux_net=dn - up)


def _allsky_sw_core_mega(
    models, spectral, solar, cloud_co,
    play_t, plev_t, tlay_t, mu0, sfc_alb_dir, sfc_alb_dif,
    lwp_t, iwp_t, rel_t, rei_t, concs_t,
    top_at_1, tile_c: int | None = None,
    # 32..64 a wash at 28.8k since the 100 MiB vmem raise (chip probe r5:
    # 18.90/18.90/18.76 ms; the old "48 OOMs" predated the limit raise);
    # None prefers a DIVIDING tile (r5s3: 0.945 @32 -> 0.902 @40 at 1800)
):
    """All-sky SW through the fused megakernel: the three delta-scaled
    cloud 2-stream products ride 3*nband extra lanes and combine with the
    gas props in-kernel (sw_clearsky_megakernel cld_bands). Inputs are
    CANONICAL lay-major top-at-0 (canonicalize_allsky_inputs). Numerics
    match _allsky_sw_core_lay_major (rrtmgp_allsky.F90 SW branch);
    adjudicated vs f64 truth on Garand: staged-f32 1.70e-3, mega-f32
    1.76e-3 W/m2 max flux error -- the inter-path delta is f32 noise."""
    import numpy as np

    from ..gasoptics.nn_gas_optics import (
        compute_nn_inputs_split,
        get_col_dry_lay_major,
    )
    from ..ops.pallas.lw_megakernel import pick_tile_c
    from ..ops.pallas.sw_megakernel import sw_clearsky_megakernel

    gd_t = GasConcs(concs_t)
    nlay, ncol = play_t.shape
    if tile_c is None:
        # VMEM-conservative candidates (3*nband cloud lanes); 40 measured
        # best at 1800 (0.945 @32 -> 0.902), 32 kept where it divides
        tile_c = pick_tile_c(ncol, 32, (40, 24, 16, 8))
    col_dry_t = get_col_dry_lay_major(
        gd_t.get_vmr("h2o", nlay, ncol), plev_t)
    x2d, const_feats, perm = compute_nn_inputs_split(
        play_t, tlay_t, gd_t, models[0], (), lay_major=True)

    one_hot = jnp.asarray(
        (spectral.gpt2band[None, :] == np.arange(spectral.nband)[:, None]),
        x2d[0].dtype,
    )
    if cloud_co.is_lut:
        # LUT cloud optics + delta-scale run fully IN-KERNEL (see LW)
        from ..ops.pallas.lw_megakernel import cloud_lut_pack

        cld_kw = dict(cld_fields=(lwp_t, iwp_t, rel_t, rei_t),
                      cld_lut=cloud_lut_pack(cloud_co))
    else:
        cld = cloud_optics(cloud_co, lwp_t, iwp_t, rel_t, rei_t,
                           as_2str=True)
        cld = delta_scale(cld)
        tauscat_c = cld.tau * cld.ssa
        cld_kw = dict(
            cld_bands=(cld.tau, tauscat_c, tauscat_c * cld.g))
    toa_src = jnp.broadcast_to(solar[None, :], (ncol, spectral.ngpt))
    alb_dir = spectral.expand(sfc_alb_dir)
    alb_dif = spectral.expand(sfc_alb_dif)
    up, dn, dn_dir = sw_clearsky_megakernel(
        models[0], models[1], x2d, col_dry_t, mu0,
        toa_src * mu0[:, None], alb_dir, alb_dif, tile_c=tile_c,
        one_hot=one_hot, const_feats=const_feats, perm=perm, **cld_kw,
    )
    if not top_at_1:
        up, dn, dn_dir = up[:, ::-1], dn[:, ::-1], dn_dir[:, ::-1]
    return FluxesBroadband(
        flux_up=up, flux_dn=dn, flux_net=dn - up, flux_dn_dir=dn_dir)


def allsky_lw(
    garand_path: str,
    cloud_optics_path: str,
    models: Sequence[NNModel],
    ncol: int = 128,
    spectral: Optional[SpectralMapping] = None,
    n_gauss_angles: int = 1,
    scan_mode: str = "sequential",
    dtype=jnp.float32,
) -> FluxesBroadband:
    """Full all-sky LW run (reference rrtmgp_allsky LW branch)."""
    spectral = spectral or lw_spectral_g128()
    atm = read_garand(garand_path, ncol)
    co = load_cloud_optics_checked(cloud_optics_path)
    table = PlanckTable.compute(spectral.band_lims_wvn_array, dtype=dtype)
    lwp, iwp, rel, rei = make_clouds(atm.play, atm.tlay, co)

    top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
    sfc_lev = -1 if top_at_1 else 0
    tsfc = atm.tlev[:, sfc_lev]
    emis = jnp.full((ncol, spectral.nband), 0.98, dtype)

    if (n_gauss_angles == 1 and scan_mode == "sequential"
            and ncol >= ALLSKY_LW_MEGA_MIN_NCOL
            and resolve_use_megakernel(lw=True, models=models)
            and len(models) == 1 and dtype == jnp.float32):
        fields, concs_t = canonicalize_allsky_inputs(
            atm.play, atm.plev, atm.tlay, atm.tlev, lwp, iwp, rel, rei,
            atm.gas_concs, top_at_1)
        fn = jax.jit(functools.partial(
            _allsky_lw_core_mega, models, table, spectral, co,
            top_at_1=top_at_1,
        ))
        play_t, plev_t, tlay_t, tlev_t, lwp_t, iwp_t, rel_t, rei_t = (
            jnp.asarray(a, dtype) for a in fields)
        return fn(play_t, plev_t, tlay_t, tlev_t,
                  jnp.asarray(tsfc, dtype), emis,
                  lwp_t, iwp_t, rel_t, rei_t,
                  {k: jnp.asarray(v, dtype) for k, v in concs_t.items()})
    if n_gauss_angles == 1 and scan_mode == "sequential":
        fn = jax.jit(functools.partial(
            _allsky_lw_core_lay_major, models, table, spectral, co,
            top_at_1=top_at_1,
        ))
    else:
        fn = jax.jit(functools.partial(
            _allsky_lw_core, models, table, spectral, co,
            top_at_1=top_at_1, n_gauss_angles=n_gauss_angles,
            scan_mode=scan_mode,
        ))
    return fn(
        jnp.asarray(atm.play, dtype), jnp.asarray(atm.plev, dtype),
        jnp.asarray(atm.tlay, dtype), jnp.asarray(atm.tlev, dtype),
        jnp.asarray(tsfc, dtype), emis,
        jnp.asarray(lwp, dtype), jnp.asarray(iwp, dtype),
        jnp.asarray(rel, dtype), jnp.asarray(rei, dtype),
        {k: jnp.asarray(v, dtype) for k, v in atm.gas_concs.concs.items()},
    )


def allsky_sw(
    garand_path: str,
    cloud_optics_path: str,
    models: Sequence[NNModel],
    ncol: int = 128,
    spectral: Optional[SpectralMapping] = None,
    kdist=None,
    solar_source: Optional[np.ndarray] = None,
    scan_mode: str = "sequential",
    dtype=jnp.float32,
) -> FluxesBroadband:
    """Full all-sky SW run (reference rrtmgp_allsky SW branch). A supplied
    kdist's NRLSSI2 solar terms take precedence over the brightness-
    temperature approximation (see rfmip.resolve_solar_source)."""
    spectral = spectral or sw_spectral_g112()
    atm = read_garand(garand_path, ncol)
    co = load_cloud_optics_checked(cloud_optics_path)
    if solar_source is None:
        solar_source = resolve_solar_source(spectral, kdist)
    solar = jnp.asarray(solar_source, dtype)
    lwp, iwp, rel, rei = make_clouds(atm.play, atm.tlay, co)

    top_at_1 = bool(atm.play[0, 0] < atm.play[0, -1])
    mu0 = jnp.full((ncol,), 0.86, dtype)
    alb = jnp.full((ncol, spectral.nband), 0.06, dtype)

    if (scan_mode == "sequential"
            and resolve_use_megakernel(models=models)
            and len(models) == 2 and dtype == jnp.float32):
        fields, concs_t = canonicalize_allsky_inputs(
            atm.play, atm.plev, atm.tlay, atm.tlev, lwp, iwp, rel, rei,
            atm.gas_concs, top_at_1)
        fn = jax.jit(functools.partial(
            _allsky_sw_core_mega, models, spectral, solar, co,
            top_at_1=top_at_1,
        ))
        play_t, plev_t, tlay_t, _, lwp_t, iwp_t, rel_t, rei_t = (
            jnp.asarray(a, dtype) for a in fields)
        return fn(play_t, plev_t, tlay_t, mu0, alb, alb,
                  lwp_t, iwp_t, rel_t, rei_t,
                  {k: jnp.asarray(v, dtype) for k, v in concs_t.items()})
    if scan_mode == "sequential":
        fn = jax.jit(functools.partial(
            _allsky_sw_core_lay_major, models, spectral, solar, co,
            top_at_1=top_at_1,
        ))
    else:
        fn = jax.jit(functools.partial(
            _allsky_sw_core, models, spectral, solar, co,
            top_at_1=top_at_1, scan_mode=scan_mode,
        ))
    return fn(
        jnp.asarray(atm.play, dtype), jnp.asarray(atm.plev, dtype),
        jnp.asarray(atm.tlay, dtype), mu0, alb, alb,
        jnp.asarray(lwp, dtype), jnp.asarray(iwp, dtype),
        jnp.asarray(rel, dtype), jnp.asarray(rei, dtype),
        {k: jnp.asarray(v, dtype) for k, v in atm.gas_concs.concs.items()},
    )


def load_cloud_optics_checked(path: str) -> CloudOptics:
    from ..extensions.cloud_optics import load_cloud_optics

    return load_cloud_optics(path)
