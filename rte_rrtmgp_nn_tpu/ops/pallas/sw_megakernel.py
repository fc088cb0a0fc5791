"""Single-kernel SW clear-sky pipeline: NN gas optics (absorption +
Rayleigh nets) + PIFM two-stream + adding, per column tile, VMEM-resident.

The staged lay-major SW core recomputes the two-stream coefficients inside
BOTH adding sweeps (cheaper than round-tripping them through HBM, ~1.3 ms
of VPU at 1800 columns) and materializes the direct beam via a separate
exp-cumsum (~0.6 ms). Inside one kernel the trade changes: coefficients
are computed ONCE in a batched phase A into VMEM scratch, the direct beam
is a sequential carry, and both adding sweeps are pure mul-adds. Scratch
rows are reused across phases (rdir/tdir become the direct-beam sources,
tau/mu0 becomes the cumulative albedo stack) so the whole pipeline fits in
five (nlay, tile, ngpt) scratch buffers.

Phasing per grid step (one column tile):
  A. batched MLPs (abs + rayleigh) -> tau/ssa -> PIFM coefficients
     (rdif, tdif, rdir, tdir, tau/mu0) in scratch        [MXU + VPU]
  B. top-down direct beam (cumulative-optical-path carry, one exp per
     level); rdir/tdir scratch overwritten with the direct-beam sources
     rdir*dinc / tdir*dinc; per-level broadband direct sums accumulated
                                                          [VPU]
  C. surface-to-top albedo/source accumulation emitting the PRE-update
     carry per layer (alb_below -> tnoscat scratch, src_below -> rdir
     scratch, both consumed after their last read)       [VPU]
  D. top-down diffuse flux sweep with in-VMEM broadband reduction [VPU]

Physics identical to ops/sw_solver._sw_2stream_broadband_fused +
predict_nn_sw (reference mo_rte_solver_kernels.F90:385-692 sw_solver
two-stream + adding; mo_gas_optics_kernels.F90:869-1018 NN SW nets);
clear-sky NN path: asymmetry g = 0 (rrtmgp_rfmip_sw.F90:542-569).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import config
from .lw_megakernel import _cloud_lut_interp, _dot2split, _dot3split, _softsign


def _mlp_tau2(ff, n2d, w1, b1, w2, b2, w3, b3, omean, ostd, col_dry,
              hc_rows):
    """BOTH SW nets as one merged chain: the absorption and rayleigh MLPs
    share their inputs (identical input_names + scaling in the shipped
    models), so their first-layer weights concatenate along N and the
    deeper layers ride one block-diagonal GEMM each -- the MXU pads K and N
    to 128 anyway, so three dots replace six at zero extra FLOP cost.
    Off-block zeros contribute exact +0.0 products, keeping every lane
    bit-identical to the separate nets. Returns (tau_abs, tau_ray);
    hc_rows is the constant-per-column first-layer contribution
    (const_feats @ w1c, see lw_megakernel._mega4_kernel)."""
    f32 = jnp.float32
    x = ff[:, :n2d]
    h = _softsign(jnp.dot(x, w1[:, :], preferred_element_type=f32)
                  + hc_rows + b1[0, :])
    h = _softsign(jnp.dot(h, w2[:, :], preferred_element_type=f32) + b2[0, :])
    y = jnp.dot(h, w3[:, :], preferred_element_type=f32) + b3[0, :]
    yt = ostd[0, :] * y + omean[0, :]
    y2 = yt * yt
    y4 = y2 * y2
    t = (y4 * y4) * col_dry
    ngpt = omean.shape[1] // 2
    return t[:, :ngpt], t[:, ngpt:]


def _cloud_combine(lt, lts, ltsg, it_, its, itsg, tau_gas, ssa_gas, oh,
                   eps):
    """Combine the two cloud-phase LUT triples with the gas props:
    2-stream sum -> delta_scale (f = g**2) -> band->gpt expansion ->
    gpt-domain increment. Split out so the ablation can patch it
    (scripts/ablate_allsky_sw.py).

    Round 5: delta_scale in SUBTRACTION form. With the phase-summed
    products tau_b, taussa = tau*ssa, tsg = tau*ssa*g and
    u = tsg^2/taussa, the classic divide chain
    (optical_props.py:150-160: ssa_b = taussa/tau_b, g_b = tsg/taussa,
    f = g_b^2, wf = ssa_b*f, tau_d = tau_b(1-wf),
    ssa_d = (ssa_b-wf)/(1-wf), g_d = (g_b-f)/(1-f)) collapses
    ALGEBRAICALLY EXACTLY to
        tau_d            = tau_b  - u
        (tau*ssa)_d      = taussa - u
        (tau*ssa*g)_d    = tsg    - u
    -- 1 divide chain instead of 6 and ~8 fewer band-wide VPU ops
    (chip: all-sky SW 18.9 -> [measured below] ms at 28.8k). f32
    regrouping shifts results ~1 ulp at band level (no singular
    denominators remain at all); adjudicated vs f64 staged truth in
    docs/PERFORMANCE.md. The eps guard reproduces the classic form's
    taussa = 0 edge (cloud-free rows: u = 0 exactly since tsg = 0)."""
    tau_b = lt + it_
    taussa = lts + its
    tsg = ltsg + itsg
    u = tsg * (tsg / jnp.maximum(eps, taussa))
    # 2-term expansion: -2.2 ms of the three 3-term chains at 28.8k for
    # 2.5e-3 W/m2 max per-column flux delta (see _dot2split chip numbers)
    tc = _dot2split(tau_b - u, oh)
    tsc = _dot2split(taussa - u, oh)
    tgc = _dot2split(tsg - u, oh)
    tau = tau_gas + tc
    tauscat = tau_gas * ssa_gas + tsc
    g = tgc / jnp.maximum(eps, tauscat)
    ssa = tauscat / jnp.maximum(eps, tau)
    return tau, ssa, g


def _pifm_coeffs(tau, ssa, g, mu0b, k_min, eps, general_g):
    """PIFM two-stream coefficients (rdif, tdif, rdir, tdir) for one tile
    batch; pure elementwise phase-A math, split out so the ablation can
    patch it (scripts/ablate_sw_mega.py). ``general_g=False`` folds the
    clear-sky g = 0 specialization as constants (f32 results identical to
    the general form -- g enters only via zero products)."""
    if general_g:
        gamma1 = (8.0 - ssa * (5.0 + 3.0 * g)) * 0.25
        gamma2 = 3.0 * (ssa * (1.0 - g)) * 0.25
        gamma3 = (2.0 - 3.0 * mu0b * g) * 0.25
        gamma4 = 1.0 - gamma3
    else:
        gamma1 = (8.0 - ssa * 5.0) * 0.25
        gamma2 = (3.0 * ssa) * 0.25
        gamma3 = 0.5
        gamma4 = 0.5
    alpha1 = gamma1 * gamma4 + gamma2 * gamma3
    alpha2 = gamma1 * gamma3 + gamma2 * gamma4
    k = jnp.sqrt(jnp.maximum((gamma1 - gamma2) * (gamma1 + gamma2), k_min))
    mu0_inv = 1.0 / mu0b
    tnoscat = jnp.exp(-tau * mu0_inv)
    e1 = jnp.exp(-tau * k)
    e2 = e1 * e1
    k2e = 2.0 * k * e1
    k_mu = k * mu0b
    k_mu2 = k_mu * k_mu
    k_g3 = k * gamma3
    k_g4 = k * gamma4
    denom = jnp.where(jnp.abs(1.0 - k_mu2) >= eps, 1.0 - k_mu2, eps)
    # ONE divide for both the diffuse normalization and the direct-beam
    # prefactor: rt_term = denom * inv and rt2 = ssa * inv replace the
    # two-divide form 1/rt_den and ssa*rt_term/denom (<=1 ulp regrouping;
    # adjudicated vs f64 alongside the merged-GEMM change)
    rt_den = k * (1.0 + e2) + gamma1 * (1.0 - e2)
    inv = 1.0 / (rt_den * denom)
    rt_term = denom * inv
    rdif = rt_term * gamma2 * (1.0 - e2)
    tdif = rt_term * k2e
    rt2 = ssa * inv
    rdir = rt2 * (
        (1.0 - k_mu) * (alpha2 + k_g3)
        - (1.0 + k_mu) * (alpha2 - k_g3) * e2
        - k2e * (gamma3 - alpha2 * mu0b) * tnoscat
    )
    tdir = rt2 * (
        k2e * (gamma4 + alpha1 * mu0b)
        - tnoscat * ((1.0 + k_mu) * (alpha1 + k_g4)
                     - (1.0 - k_mu) * (alpha1 - k_g4) * e2)
    )
    rdir = jnp.clip(rdir, 0.0, 1.0 - tnoscat)
    tdir = jnp.clip(tdir, 0.0, 1.0 - tnoscat - rdir)
    return rdif, tdif, rdir, tdir


def _phase_direct(nlay, tile_c, ngpt, unroll, sweep_stored,
                  inc_dir, s_a, s_b, s_c, dir_acc):
    """Phase B: top-down direct beam. On entry s_c holds tau/mu0 and
    s_a/s_b hold rdir/tdir; on exit s_a/s_b hold the direct-beam sources
    (rdir*dinc / tdir*dinc), dir_acc the broadband direct sums, and the
    surface direct flux is returned. Split out for the ablation."""
    f32 = jnp.float32
    if sweep_stored:
        # stored-sweep: the only sequential dependence in the direct beam
        # is the cumulative path -- the loop body shrinks to one add per
        # layer (s_c[l] overwritten in place with the PRE-update path), and
        # the exp, the source scaling, and the broadband reduction all run
        # once over the full (nlay, tile, ngpt) block. Identical floats in
        # identical order per element -> bit-exact vs the fused loop.
        def down_path(l, path):
            tau_l = s_c[l]
            s_c[l] = path
            return path + tau_l

        path = jax.lax.fori_loop(
            0, nlay, down_path, jnp.zeros((tile_c, ngpt), f32),
            unroll=unroll)
        dinc3 = inc_dir[None, :, :] * jnp.exp(-s_c[:, :, :])
        dir_acc[pl.ds(0, nlay), :] = jnp.sum(dinc3, axis=2)
        s_a[:, :, :] = s_a[:, :, :] * dinc3   # src_up
        s_b[:, :, :] = s_b[:, :, :] * dinc3   # src_dn
        dinc = inc_dir * jnp.exp(-path)
        dir_acc[pl.ds(nlay, 1), :] = jnp.sum(dinc, axis=1)[None, :]
        return dinc

    def down_dir(l, path):
        dinc_l = inc_dir * jnp.exp(-path)
        dir_acc[pl.ds(l, 1), :] = jnp.sum(dinc_l, axis=1)[None, :]
        s_a[l] = s_a[l] * dinc_l        # src_up
        s_b[l] = s_b[l] * dinc_l        # src_dn
        return path + s_c[l]

    path = jax.lax.fori_loop(
        0, nlay, down_dir, jnp.zeros((tile_c, ngpt), f32), unroll=unroll)
    dinc = inc_dir * jnp.exp(-path)
    dir_acc[pl.ds(nlay, 1), :] = jnp.sum(dinc, axis=1)[None, :]
    return dinc


def _phase_albedo(nlay, unroll, alb_sfc, src_sfc, s_rdif, s_tdif, s_a, s_b,
                  s_c, s_d):
    """Phase C: surface-to-top cumulative albedo/source, emitting the
    PRE-update carry: s_c[l] = alb_below, s_a[l] = src_below (s_c's
    tau/mu0 and s_a's src_up are each read for the last time in the same
    iteration that overwrites them), and s_d[l] = 1/(1 - rdif*alb) so the
    flux sweep reuses the EXACT divide instead of recomputing it (60
    sequential divides off phase D's critical path; bit-identical
    operands -> bit-identical d). Returns (alb_top, src_top)."""
    def up_acc_fn(i, carry):
        alb, src = carry
        l = nlay - 1 - i
        d = 1.0 / (1.0 - s_rdif[l] * alb)
        src_new = s_a[l] + s_tdif[l] * d * (src + alb * s_b[l])
        alb_new = s_rdif[l] + s_tdif[l] * s_tdif[l] * alb * d
        s_c[l] = alb
        s_a[l] = src
        s_d[l] = d
        return alb_new, src_new

    return jax.lax.fori_loop(0, nlay, up_acc_fn, (alb_sfc, src_sfc),
                             unroll=unroll)


def _phase_flux(nlay, unroll, sweep_stored, inc_dif,
                s_rdif, s_tdif, s_a, s_b, s_c, s_d, dn_acc, up_acc):
    """Phase D: top-down diffuse flux sweep with in-VMEM broadband
    reduction (levels 1..nlay; level 0 is written by the caller). The
    per-step denominator reciprocal comes pre-stored from phase C (s_d),
    leaving pure FMAs in the recurrence."""
    if sweep_stored:
        # the upward flux and both reductions are pure functions of the
        # stored downward flux -- hoist them out of the recurrence (s_b[l]
        # is dead after its read in iteration l, so it stores fdn_next)
        def down_flux_s(l, fdn):
            fdn_next = ((s_tdif[l] * fdn + s_rdif[l] * s_a[l] + s_b[l])
                        * s_d[l])
            s_b[l] = fdn_next
            return fdn_next

        jax.lax.fori_loop(0, nlay, down_flux_s, inc_dif, unroll=unroll)
        fdn_all = s_b[:, :, :]
        fup_all = fdn_all * s_c[:, :, :] + s_a[:, :, :]
        dn_acc[pl.ds(1, nlay), :] = jnp.sum(fdn_all, axis=2)
        up_acc[pl.ds(1, nlay), :] = jnp.sum(fup_all, axis=2)
        return

    def down_flux(l, fdn):
        fdn_next = (s_tdif[l] * fdn + s_rdif[l] * s_a[l] + s_b[l]) * s_d[l]
        fup = fdn_next * s_c[l] + s_a[l]
        dn_acc[pl.ds(l + 1, 1), :] = jnp.sum(fdn_next, axis=1)[None, :]
        up_acc[pl.ds(l + 1, 1), :] = jnp.sum(fup, axis=1)[None, :]
        return fdn_next

    jax.lax.fori_loop(0, nlay, down_flux, inc_dif, unroll=unroll)


def _sw_mega_kernel(nlay, ngpt, nband, n2d, n_cld, lut, tile_c, k_min, eps,
                    unroll, sweep_stored, n_lane_refs,
                    *refs):
    f32 = jnp.float32
    rows = nlay * tile_c

    # ---- phase A: batched merged MLPs + PIFM two-stream coefficients -----
    if n_lane_refs:
        # lanes-direct probe mode: each feature is its own well-tiled
        # (nlay, tile) ref (no tile-padded fused-input DMA); the feature
        # matrix is assembled IN VMEM -- the relayout under test
        # (docs/PERFORMANCE.md mega5/mega6 measured this LOSING for LW)
        lane_refs = refs[:n_lane_refs]
        refs = refs[n_lane_refs:]
        ff = jnp.stack([r[:, :] for r in lane_refs], axis=-1).reshape(
            rows, n_lane_refs)
    else:
        ff_ref = refs[0]
        refs = refs[1:]
        ff = ff_ref[:, :, :].reshape(rows, ff_ref.shape[-1])
    (cf_ref, mu0_ref, incdir_ref, incdif_ref,
     albdir_ref, albdif_ref, oh_ref,
     cliq_hi, cliq_mid, cliq_lo, cice_hi, cice_mid, cice_lo,
     w1_ref, w1c_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
     om_ref, os_ref,
     up_ref, dn_ref, dir_ref,
     s_rdif, s_tdif, s_a, s_b, s_c, s_d,
     dn_acc, up_acc, dir_acc) = refs
    cd = ff[:, n2d:n2d + 1]
    hc = jnp.dot(cf_ref[:, :], w1c_ref[:, :], preferred_element_type=f32)
    hc_rows = jnp.broadcast_to(
        hc[None, :, :], (nlay, tile_c, hc.shape[-1])
    ).reshape(rows, hc.shape[-1])
    tau_abs, tau_ray = _mlp_tau2(
        ff, n2d, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
        om_ref, os_ref, cd, hc_rows)
    tau_gas = tau_abs + tau_ray
    tau_safe = jnp.where(tau_gas > 0, tau_gas, 1.0)
    ssa_gas = jnp.where(tau_gas > 0, tau_ray / tau_safe, 0.0)
    if lut is not None:
        # all-sky, FULLY in-kernel cloud optics: 4 physical lanes
        # (lwp, iwp, rel, rei) -> LUT lerp -> 2-stream combine ->
        # delta-scale -> band->gpt expansion, all VMEM-resident (mirrors
        # extensions/cloud_optics.py + optical_props.delta_scale)
        n_liq, n_ice, liq_off, liq_step, ice_off, ice_step = lut
        oh = oh_ref[:, :]
        o_c = n2d + 1
        lt, lts, ltsg = _cloud_lut_interp(
            ff[:, o_c:o_c + 1], ff[:, o_c + 2:o_c + 3],
            cliq_hi[:, :], cliq_mid[:, :], cliq_lo[:, :],
            n_liq, nband, liq_off, liq_step)
        it_, its, itsg = _cloud_lut_interp(
            ff[:, o_c + 1:o_c + 2], ff[:, o_c + 3:o_c + 4],
            cice_hi[:, :], cice_mid[:, :], cice_lo[:, :],
            n_ice, nband, ice_off, ice_step)
        tau, ssa, g = _cloud_combine(lt, lts, ltsg, it_, its, itsg,
                                     tau_gas, ssa_gas, oh, eps)
    elif n_cld:
        # all-sky: delta-scaled cloud 2-stream props ride 3*nband lanes
        # (tau_c, tau_c*ssa_c, tau_c*ssa_c*g_c) and combine with the (g=0)
        # gas props in the g-point domain, exactly as the staged all-sky
        # core (inc_2stream_by_2stream_bybnd,
        # mo_optical_props_kernels.F90:269-305 with zero gas asymmetry)
        oh = oh_ref[:, :]
        o_c = n2d + 1
        # 2-term expansion (see _dot2split chip numbers)
        tc = _dot2split(ff[:, o_c:o_c + n_cld], oh)
        tsc = _dot2split(ff[:, o_c + n_cld:o_c + 2 * n_cld], oh)
        tgc = _dot2split(ff[:, o_c + 2 * n_cld:o_c + 3 * n_cld], oh)
        tau = tau_gas + tc
        tauscat = tau_gas * ssa_gas + tsc
        g = tgc / jnp.maximum(eps, tauscat)
        ssa = tauscat / jnp.maximum(eps, tau)
    else:
        tau = tau_gas
        ssa = ssa_gas

    # mu0 per column, broadcast to the (nlay*tile, 1) row layout
    mu0 = mu0_ref[:, :]                       # (tile_c, 1)
    mu0b = jnp.broadcast_to(mu0[None, :, :], (nlay, tile_c, 1)).reshape(rows, 1)
    mu0_inv = 1.0 / mu0b

    # PIFM coefficients (general g when clouds are present; the g = 0
    # clear-sky specialization keeps the _sw_two_stream_coeffs structure so
    # f32 results match the staged path -- g enters only via
    # folded-constant zero products).
    rdif, tdif, rdir, tdir = _pifm_coeffs(
        tau, ssa, g if (n_cld or lut is not None) else None, mu0b,
        k_min, eps, general_g=bool(n_cld or lut is not None))

    s_rdif[:, :, :] = rdif.reshape(nlay, tile_c, ngpt)
    s_tdif[:, :, :] = tdif.reshape(nlay, tile_c, ngpt)
    s_a[:, :, :] = rdir.reshape(nlay, tile_c, ngpt)
    s_b[:, :, :] = tdir.reshape(nlay, tile_c, ngpt)
    s_c[:, :, :] = (tau * mu0_inv).reshape(nlay, tile_c, ngpt)

    # ---- phase B: direct beam; s_a/s_b become the direct-beam sources ----
    # The beam is exp(-CUMULATIVE optical path), one exp per level, NOT a
    # running product of per-layer exp(-tau/mu0): the VPU exp is ~5e-6
    # accurate with a correlated bias, and 60 multiplied exps compound it
    # to ~3e-4 relative (0.37 W/m2 at TOA) while the cumulative form
    # matches the staged exp(-cumsum) path to f32 summation order.
    inc_dir = incdir_ref[:, :]
    dinc = _phase_direct(nlay, tile_c, ngpt, unroll, sweep_stored,
                         inc_dir, s_a, s_b, s_c, dir_acc)

    # ---- phase C: surface-to-top cumulative albedo/source ---------------
    alb_sfc = albdif_ref[:, :]
    src_sfc = dinc * albdir_ref[:, :]
    alb_top, src_top = _phase_albedo(
        nlay, unroll, alb_sfc, src_sfc, s_rdif, s_tdif, s_a, s_b, s_c, s_d)

    inc_dif = incdif_ref[:, :]
    dn_acc[pl.ds(0, 1), :] = jnp.sum(inc_dif, axis=1)[None, :]
    up_acc[pl.ds(0, 1), :] = jnp.sum(
        inc_dif * alb_top + src_top, axis=1)[None, :]

    # ---- phase D: top-down diffuse flux sweep + broadband reduction ------
    _phase_flux(nlay, unroll, sweep_stored, inc_dif,
                s_rdif, s_tdif, s_a, s_b, s_c, s_d, dn_acc, up_acc)

    dirs = dir_acc[:, :]
    up_ref[:, :] = jnp.transpose(up_acc[:, :], (1, 0))
    dn_ref[:, :] = jnp.transpose(dn_acc[:, :] + dirs, (1, 0))
    dir_ref[:, :] = jnp.transpose(dirs, (1, 0))


def sw_clearsky_megakernel(
    abs_model,
    ray_model,
    nn_inputs,        # SCALED layer-varying features: list of (nlay, ncol)
                      #   lanes (preferred: one fused concat, see lw mega4)
                      #   or a single (nlay, ncol, n2d) array
    col_dry,          # (nlay, ncol)
    mu0,              # (ncol,) cosine of solar zenith (night cols pre-safed)
    inc_flux_dir,     # (ncol, ngpt) TOA direct spectral flux * mu0
    sfc_alb_dir,      # (ncol, ngpt)
    sfc_alb_dif,      # (ncol, ngpt)
    inc_flux_dif=None,   # (ncol, ngpt) or None
    tile_c: int = 64,
    unroll: int | None = None,
    interpret: bool | None = None,
    cld_bands=None,   # (tau_c, tau_c*ssa_c, tau_c*ssa_c*g_c) each
                      #   (nlay, ncol, nband) DELTA-SCALED, or None
    one_hot=None,     # (nband, ngpt) band->gpt map, required with clouds
    cld_fields=None,  # (lwp, iwp, rel, rei) each (nlay, ncol): in-kernel
                      #   cloud-optics LUT path (needs cld_lut)
    cld_lut=None,     # lw_megakernel.cloud_lut_pack(co) result
    sweep_stored: bool = False,  # hoist exp/reductions out of the sweeps
    const_feats=None,  # (ncol, nc) SCALED constant-per-column features
    perm=None,         # lane order -> model input row map (see
                       #   compute_nn_inputs_split); identity if None
    input_mode: str = "fused",  # "lanes": skip the fused-input assembly
                       #   and pass each feature as its own well-tiled
                       #   (nlay, ncol) ref, assembling the feature matrix
                       #   IN VMEM (clear-sky only; chip probe for the
                       #   8->128 tile-pad DMA question, VERDICT r4 item 2)
):
    """Fully fused SW pipeline: packed features in, broadband
    (ncol, nlay+1) (flux_up, flux_dn_total, flux_dn_dir) out, ONE Pallas
    kernel. Canonical top-at-0 layer order (flip outside for top_at_1 ==
    False), f32, two 3-layer softsign nets (abs + rayleigh) merged into one
    block-diagonal GEMM chain (bit-identical, see _mlp_tau2). The two nets
    must share input_names and input scaling (true of the shipped SW
    models; validated here).

    Numerics match sw_solver_2stream_lay_major(broadband=True) to f32
    accumulation order; see _sw_mega_kernel for the phase structure.

    Pass nn_inputs as a LIST of per-lane scaled (nlay, ncol) arrays
    (compute_nn_inputs_split) on the hot path: a pre-stacked 3-D array
    makes XLA materialize the features lane-major and then relayout them
    twice into the tile-padded kernel operand (~13.5 ms of the 39 ms call
    at 57.6k columns, round-4 trace); the lane list collapses that to the
    single fused concatenate + one operand relayout, exactly like
    lw_clearsky_mega4.

    cld_bands turns the kernel into the ALL-SKY SW pipeline: the three
    delta-scaled cloud 2-stream products ride 3*nband extra input lanes,
    are expanded band->gpt in-kernel (exact 3-term-split one-hot matmuls)
    and combined with the gas props before the general-asymmetry PIFM
    coefficients -- equivalent to delta_scale + increment(OpticalProps2str)
    + sw_solver_2stream (reference rrtmgp_allsky.F90 SW branch) with no
    (nlay, ncol, ngpt) HBM staging.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lanes2d = None
    if isinstance(nn_inputs, (list, tuple)):
        n2d = len(nn_inputs)
        nlay, ncol = nn_inputs[0].shape
        lanes2d = [l.astype(jnp.float32) for l in nn_inputs]
        lane_parts = [l[..., None] for l in lanes2d]
    else:
        nlay, ncol, n2d = nn_inputs.shape
        lane_parts = [nn_inputs.astype(jnp.float32)]
    if unroll is None:
        # Mosaic supports only unroll=1 or full; fully unrolling the three
        # sweep loops kills per-iteration loop/index overhead (measured
        # 49.6->39.2 ms at 57.6k cols, 2.77->2.49 ms at 1800, bit-exact).
        # Interpret mode keeps 1: unrolling just bloats the trace on CPU.
        unroll = 1 if interpret else nlay
    ngpt = abs_model.weights[-1].shape[-1]
    f32 = jnp.float32

    parts = lane_parts + [col_dry.astype(f32)[..., None]]
    n_cld = 0
    lut_static = None
    nband = 1
    if cld_fields is not None:
        if cld_lut is None:
            raise ValueError("cld_fields requires cld_lut (cloud_lut_pack)")
        liq3, ice3, geom = cld_lut
        parts += [c.astype(f32)[..., None] for c in cld_fields]
        lut_static = (liq3[0].shape[0], ice3[0].shape[0], *geom)
        one_hot = jnp.asarray(one_hot, f32)
        nband = one_hot.shape[0]
    elif cld_bands is not None:
        n_cld = cld_bands[0].shape[-1]
        parts += [c.astype(f32) for c in cld_bands]
        one_hot = jnp.asarray(one_hot, f32)
    else:
        one_hot = jnp.zeros((1, ngpt), f32)  # unused placeholder block
    if lut_static is None:
        z = jnp.zeros((1, 1), f32)
        liq3 = ice3 = (z, z, z)
    lanes_direct = None
    if input_mode == "lanes":
        if lanes2d is None or cld_fields is not None or cld_bands is not None:
            raise ValueError("input_mode='lanes' requires a clear-sky lane "
                             "list input")
        if not interpret and tile_c % 128:
            # Mosaic requires 2-D block minor dims lane-aligned (mega5)
            raise ValueError("input_mode='lanes' needs tile_c % 128 == 0 "
                             f"on TPU (got {tile_c})")
        lanes_direct = lanes2d + [col_dry.astype(f32)]
        fused = None
    elif lanes2d is not None:
        # Assemble the 2-D lanes as ONE contiguous lane-major stack
        # (perfectly tiled writes) followed by ONE transpose copy into the
        # kernel's lane-minor layout. Left to itself XLA relayouts every
        # (nlay, ncol, 1) lane separately and concatenates in the
        # tile-padded domain (8 x 2.65 ms copies + 22 ms concat at 57.6k
        # cols, round-4 trace); the barrier pins the cheap
        # stack | single copy schedule. With 3-D cld_bands present the
        # stacked lanes join them in a few-part wide concat (the
        # pathology is many NARROW parts, not concat itself).
        # every width-1 trailing part (col_dry, cld_fields) rides the
        # stack; only the wide 3-D cld_bands stay as concat parts. Trailing
        # width-1 parts always precede cld_bands in `parts`, so the fused
        # lane order is unchanged.
        parts2d = lanes2d + [p[..., 0] for p in parts[len(lanes2d):]
                             if p.shape[-1] == 1]
        rest = [p for p in parts[len(lanes2d):] if p.shape[-1] != 1]
        big = jax.lax.optimization_barrier(jnp.stack(parts2d, axis=0))
        stacked = jnp.transpose(big, (1, 2, 0))
        fused = (jnp.concatenate([stacked, *rest], axis=-1) if rest
                 else stacked)
    else:
        fused = jnp.concatenate(parts, axis=-1)  # ONE concat (see lw mega4)
    nfu = n2d + 1 if fused is None else fused.shape[-1]
    mu0c = mu0.astype(f32)[:, None]
    if inc_flux_dif is None:
        inc_flux_dif = jnp.zeros((ncol, ngpt), f32)

    if const_feats is None:
        const_feats = jnp.zeros((ncol, 1), f32)
    const_feats = const_feats.astype(f32)
    nc = const_feats.shape[-1]

    cpad = (-ncol) % tile_c
    if cpad:
        pad2 = lambda a: jnp.pad(a, ((0, cpad), (0, 0)))
        if fused is None:
            lanes_direct = [jnp.pad(l, ((0, 0), (0, cpad)))
                            for l in lanes_direct]
        else:
            fused = jnp.pad(fused, ((0, 0), (0, cpad), (0, 0)))
        # padded mu0 = 1 keeps 1/mu0 finite in the dead columns
        mu0c = jnp.pad(mu0c, ((0, cpad), (0, 0)), constant_values=1.0)
        inc_flux_dir = pad2(inc_flux_dir)
        inc_flux_dif = pad2(inc_flux_dif)
        sfc_alb_dir = pad2(sfc_alb_dir)
        sfc_alb_dif = pad2(sfc_alb_dif)
        const_feats = pad2(const_feats)
    n = mu0c.shape[0]
    grid = (n // tile_c,)

    row2 = lambda a: jnp.asarray(a, f32).reshape(1, -1)

    # ---- merge the two nets into one block-diagonal GEMM chain ----------
    if tuple(abs_model.input_names) != tuple(ray_model.input_names):
        raise ValueError("SW megakernel requires matching abs/ray inputs")
    if not (np.array_equal(np.asarray(abs_model.input_min),
                           np.asarray(ray_model.input_min))
            and np.array_equal(np.asarray(abs_model.input_max),
                               np.asarray(ray_model.input_max))):
        # the features are scaled ONCE with abs_model's coefficients; a
        # ray net trained with different scaling would silently see
        # wrongly-scaled inputs
        raise ValueError("SW megakernel requires matching abs/ray input "
                         "scaling (input_min/input_max differ)")
    if abs_model.weights[-1].shape[-1] != ray_model.weights[-1].shape[-1]:
        # _mlp_tau2 slices the merged output at omean.shape[1]//2; unequal
        # widths would silently mis-slice tau_abs/tau_ray
        raise ValueError("SW megakernel requires equal abs/ray output "
                         "widths (got %d vs %d)"
                         % (abs_model.weights[-1].shape[-1],
                            ray_model.weights[-1].shape[-1]))
    if perm is None:
        perm = list(range(n2d))
        if nc > 1 or len(abs_model.input_names) != n2d:
            raise ValueError("const_feats requires an explicit perm")

    def split_w1(m):
        w1 = jnp.asarray(m.weights[0], f32)
        w1a = w1[np.asarray(perm[:n2d])]
        w1c = (w1[np.asarray(perm[n2d:])] if len(perm) > n2d
               else jnp.zeros((nc, w1.shape[1]), f32))
        return w1a, w1c

    def bdiag(a, b):
        a = jnp.asarray(a, f32)
        b = jnp.asarray(b, f32)
        return jnp.concatenate([
            jnp.concatenate([a, jnp.zeros((a.shape[0], b.shape[1]), f32)], 1),
            jnp.concatenate([jnp.zeros((b.shape[0], a.shape[1]), f32), b], 1),
        ], 0)

    w1a_a, w1c_a = split_w1(abs_model)
    w1a_r, w1c_r = split_w1(ray_model)
    w1cat = jnp.concatenate([w1a_a, w1a_r], 1)
    w1ccat = jnp.concatenate([w1c_a, w1c_r], 1)
    cat1 = lambda f: row2(jnp.concatenate(
        [jnp.asarray(f(abs_model), f32).ravel(),
         jnp.asarray(f(ray_model), f32).ravel()]))
    b1cat = cat1(lambda m: m.biases[0])
    b2cat = cat1(lambda m: m.biases[1])
    b3cat = cat1(lambda m: m.biases[2])
    omcat = cat1(lambda m: m.output_mean)
    oscat = cat1(lambda m: m.output_std)
    w2bd = bdiag(abs_model.weights[1], ray_model.weights[1])
    w3bd = bdiag(abs_model.weights[2], ray_model.weights[2])

    rep = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                   memory_space=pltpu.VMEM)
    col2 = lambda d: pl.BlockSpec((tile_c, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    out_bs = pl.BlockSpec((tile_c, nlay + 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    if lanes_direct is not None:
        n_lane_refs = len(lanes_direct)
        lane_bs = [pl.BlockSpec((nlay, tile_c), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * n_lane_refs
        ff_args = tuple(lanes_direct)
    else:
        n_lane_refs = 0
        lane_bs = [pl.BlockSpec((nlay, tile_c, nfu), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)]
        ff_args = (fused,)
    kernel = functools.partial(
        _sw_mega_kernel, nlay, ngpt, nband, n2d, n_cld, lut_static, tile_c,
        float(config.k_min), float(np.finfo(np.float32).eps), unroll,
        sweep_stored, n_lane_refs,
    )
    up, dn, dn_dir = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            *lane_bs,
            col2(nc), col2(1), col2(ngpt), col2(ngpt), col2(ngpt),
            col2(ngpt),
            rep(one_hot.shape),
            *(rep(t.shape) for t in (*liq3, *ice3)),
            rep(w1cat.shape), rep(w1ccat.shape), rep(b1cat.shape),
            rep(w2bd.shape), rep(b2cat.shape), rep(w3bd.shape),
            rep(b3cat.shape), rep(omcat.shape), rep(oscat.shape),
        ],
        out_specs=(out_bs, out_bs, out_bs),
        out_shape=(jax.ShapeDtypeStruct((n, nlay + 1), f32),) * 3,
        scratch_shapes=[
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay + 1, tile_c), f32),
            pltpu.VMEM((nlay + 1, tile_c), f32),
            pltpu.VMEM((nlay + 1, tile_c), f32),
        ],
        # six (nlay, tile, ngpt) scratch buffers scale with the tile and
        # exceed the 16 MiB default Mosaic budget past tile 32; v5e has
        # 128 MiB of VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        *ff_args, const_feats, mu0c, inc_flux_dir.astype(f32),
        inc_flux_dif.astype(f32),
        sfc_alb_dir.astype(f32), sfc_alb_dif.astype(f32), one_hot,
        *liq3, *ice3,
        w1cat, w1ccat, b1cat, w2bd, b2cat, w3bd, b3cat, omcat, oscat,
    )
    return up[:ncol], dn[:ncol], dn_dir[:ncol]
