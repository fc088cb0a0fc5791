"""Single-kernel LW clear-sky pipeline: NN gas optics + Planck sources +
no-scat broadband transport, per column tile, everything VMEM-resident.

Motivation (docs/PERFORMANCE.md): the XLA pipeline moves ~1.5 GB of HBM
traffic per 1800-column call (tau, pfrac, sources materialize between
stages). Per column tile this kernel keeps tau/pfrac in VMEM scratch and
writes only the (tile, nlay+1) broadband sums -- total HBM traffic is the
small 2-D inputs plus band-resolved Planck values (~30 MB).

VMEM-shaped layout (v5e, 16 MB/core):
  - ALL per-layer inputs (scaled NN features, col_dry, and the three
    band-Planck fields) are lane-packed into ONE (nlay, ncol, nfu) array:
    separate inputs each pad their tiny lane dim (7 or 16) to 128 lanes and
    cost ~4 MB/block regardless of true size; fused they share one block.
  - layer-leading layout (nlay, tile, X): the per-layer loop indexes the
    leading dim, the best-supported dynamic index in Mosaic, and matches
    the driver's lay-major staging (no transposes feeding the kernel).
  - fluxes accumulate in (nlay+1, tile) scratch (row writes per layer) and
    are written once, transposed, to (tile, nlay+1) output blocks -- which
    keeps the output lane dim == full array dim, legal for any tile size.

Two survivors of the variant ladder (mega1/2/3 measured and removed, see
docs/PERFORMANCE.md):
  - lw_prep_pallas: fused phase A only (MLP + sources, bit-exact vs the
    staged path); the broadband sweeps stay full-width XLA scans.
  - lw_clearsky_mega4: the whole pipeline in one kernel -- phase A with
    in-kernel totplnk interpolation (exact 3-term bf16 split) + both
    broadband sweeps over VMEM scratch; thin (n2d+4)-lane input.

Grid steps are independent (no sequential carry across tiles), so the
grid parallelizes/pipelines freely. Physics identical to
lw_solver_noscat(broadband=True) + predict_nn_lw + compute_planck_source_nn
(reference mo_rte_solver_kernels.F90:119-330, mo_gas_optics_kernels.F90:
690-862, 615-683), single diffusivity angle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..table_split import paired_diff_table, split3_bf16


def _softsign(x):
    return x / (1.0 + jnp.abs(x))


def _source_fact(tl, trans, tau_thresh):
    """The linear-in-tau source factor ``fact`` (reference
    mo_rte_solver_kernels.F90:174-186): (1-T)/tau - T above the threshold,
    the 2nd-order Taylor form below it. Split out so the ablation harness
    can time the divide (scripts/ablate_lw_mega.py)."""
    tl_safe = jnp.where(tl > tau_thresh, tl, 1.0)
    return jnp.where(
        tl > tau_thresh,
        (1.0 - trans) / tl_safe - trans,
        tl * (0.5 - (1.0 / 3.0) * tl),
    )


def _phase_a_sources(nlay, ngpt, nband, nf, tile_c, d_secant, tau_thresh,
                     fused_ref, pls_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                     omean_ref, ostd_ref, oh_ref):
    """Shared phase A: batched MLP + transmittance + g-point Planck sources
    from a lane-packed (nlay, tile_c, [x | col_dry | B_lay | B_lev_top |
    B_lev_bot]) block, with HOST-interpolated band Planck values (bit-exact
    vs the staged XLA path; mega4 interpolates in-kernel instead via the
    exact three-term split, planck_interp_table). Returns flat
    (nlay*tile_c, ngpt) trans/src_dn/src_up and the (tile_c, ngpt)
    surface source."""
    f32 = jnp.float32
    o_lay = nf + 1
    o_top = o_lay + nband
    o_bot = o_top + nband
    rows = nlay * tile_c

    ff = fused_ref[:, :, :].reshape(rows, fused_ref.shape[-1])
    x = ff[:, :nf]
    w1 = w1_ref[:, :]
    h = _softsign(jnp.dot(x, w1, preferred_element_type=f32) + b1_ref[0, :])
    h = _softsign(jnp.dot(h, w2_ref[:, :], preferred_element_type=f32)
                  + b2_ref[0, :])
    y = jnp.dot(h, w3_ref[:, :], preferred_element_type=f32) + b3_ref[0, :]
    yt = ostd_ref[0, :ngpt] * y[:, :ngpt] + omean_ref[0, :ngpt]
    y2 = yt * yt
    y4 = y2 * y2
    tl = (y4 * y4) * ff[:, nf:nf + 1] * d_secant
    pf = y[:, ngpt:2 * ngpt]
    pf = pf * pf

    trans = jnp.exp(-tl)
    fact = _source_fact(tl, trans, tau_thresh)
    oh = oh_ref[:, :]
    lay = pf * jnp.dot(ff[:, o_lay:o_top], oh, preferred_element_type=f32)
    lev_t = pf * jnp.dot(ff[:, o_top:o_bot], oh, preferred_element_type=f32)
    # pfrac of the layer below: shift rows by one layer (= tile_c rows in
    # the (nlay, tile_c) flattening); the bottom layer reuses its own pfrac
    pf_next = pltpu.roll(pf, rows - tile_c, axis=0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    pf_next = jnp.where(ridx >= (nlay - 1) * tile_c, pf, pf_next)
    lev_b = pf_next * jnp.dot(ff[:, o_bot:o_bot + nband], oh,
                              preferred_element_type=f32)
    one_m_t = 1.0 - trans
    two_fact = 2.0 * fact
    src_dn = one_m_t * lev_b + two_fact * (lay - lev_b)
    src_up = one_m_t * lev_t + two_fact * (lay - lev_t)
    sfc_src = pf[(nlay - 1) * tile_c:, :] * jnp.dot(
        pls_ref[:, :], oh, preferred_element_type=f32)
    return trans, src_dn, src_up, sfc_src


def _prep_kernel(nlay, ngpt, nband, nf, tile_c, d_secant, tau_thresh,
                 fused_ref, pls_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 omean_ref, ostd_ref, oh_ref,
                 trans_ref, sdn_ref, sup_ref, sfc_ref):
    trans, src_dn, src_up, sfc_src = _phase_a_sources(
        nlay, ngpt, nband, nf, tile_c, d_secant, tau_thresh,
        fused_ref, pls_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
        omean_ref, ostd_ref, oh_ref)
    trans_ref[:, :, :] = trans.reshape(nlay, tile_c, ngpt)
    sdn_ref[:, :, :] = src_dn.reshape(nlay, tile_c, ngpt)
    sup_ref[:, :, :] = src_up.reshape(nlay, tile_c, ngpt)
    sfc_ref[:, :] = sfc_src


def lw_prep_pallas(
    model,
    nn_inputs,        # (nlay, ncol, nf) scaled features, layer-major
    col_dry,          # (nlay, ncol)
    planck_lay_band,  # (nlay, ncol, nband)
    planck_lev_band,  # (nlay+1, ncol, nband)
    planck_sfc_band,  # (ncol, nband)
    one_hot,          # (nband, ngpt)
    d_secant: float = 1.66,
    tile_c: int = 32,
    interpret: bool | None = None,
):
    """Fused LW front-end: feature-packed inputs -> (trans, src_dn, src_up,
    sfc_source), each layer-major, in ONE loop-free Pallas pass.

    Replaces the staged MLP -> postproc -> Planck expand -> source stages:
    tau, pfrac, and the lay/lev g-point sources never reach HBM (the staged
    path materializes ~6 (nlay, ncol, ngpt) fields ~ 330 MB at RFMIP scale;
    this writes exactly the 3 the solver scans consume). The MLP runs as
    three (nlay*tile_c, .) GEMMs per grid step -- full-height MXU batches,
    no per-layer loop. The downstream broadband sweeps stay in XLA lax.scan
    (full-width, already bandwidth-optimal).

    Physics identical to predict_nn_lw + compute_planck_source_nn + the
    source/transmittance prologue of lw_solver_noscat (reference
    mo_gas_optics_kernels.F90:690-862, 615-683;
    mo_rte_solver_kernels.F90:119-330). Single 'lw_both' model, f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nlay, ncol, nf = nn_inputs.shape
    nband, ngpt = one_hot.shape
    f32 = jnp.float32

    fused = jnp.concatenate(
        [
            nn_inputs.astype(f32),
            col_dry.astype(f32)[..., None],
            planck_lay_band.astype(f32),
            planck_lev_band[:-1].astype(f32),
            planck_lev_band[1:].astype(f32),
        ],
        axis=-1,
    )
    nfu = fused.shape[-1]
    cpad = (-ncol) % tile_c
    if cpad:
        fused = jnp.pad(fused, ((0, 0), (0, cpad), (0, 0)))
        planck_sfc_band = jnp.pad(planck_sfc_band, ((0, cpad), (0, 0)))
    n = fused.shape[1]
    grid = (n // tile_c,)

    w1, w2, w3 = model.weights
    b1, b2, b3 = model.biases
    row2 = lambda a: jnp.asarray(a, f32).reshape(1, -1)
    tau_thresh = float(np.sqrt(np.finfo(np.float32).eps))

    rep = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                   memory_space=pltpu.VMEM)
    lay3 = lambda d: pl.BlockSpec((nlay, tile_c, d), lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _prep_kernel, nlay, ngpt, nband, nf, tile_c, d_secant, tau_thresh
    )
    trans, sdn, sup, sfc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lay3(nfu),
            pl.BlockSpec((tile_c, nband), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            rep(w1.shape), rep((1, b1.shape[0])),
            rep(w2.shape), rep((1, b2.shape[0])),
            rep(w3.shape), rep((1, b3.shape[0])),
            rep((1, model.output_mean.shape[0])),
            rep((1, model.output_std.shape[0])),
            rep(one_hot.shape),
        ],
        out_specs=(
            lay3(ngpt), lay3(ngpt), lay3(ngpt),
            pl.BlockSpec((tile_c, ngpt), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nlay, n, ngpt), f32),
            jax.ShapeDtypeStruct((nlay, n, ngpt), f32),
            jax.ShapeDtypeStruct((nlay, n, ngpt), f32),
            jax.ShapeDtypeStruct((n, ngpt), f32),
        ),
        interpret=interpret,
    )(
        fused,
        planck_sfc_band.astype(f32),
        w1.astype(f32), row2(b1), w2.astype(f32), row2(b2),
        w3.astype(f32), row2(b3),
        row2(model.output_mean), row2(model.output_std),
        one_hot.astype(f32),
    )
    if cpad:
        trans, sdn, sup = trans[:, :ncol], sdn[:, :ncol], sup[:, :ncol]
        sfc = sfc[:ncol]
    return trans, sdn, sup, sfc


def planck_interp_table(totplnk):
    """Three-term bf16 split of the combined [table | forward-difference]
    totplnk matrix for exact in-kernel linear interpolation.

    The MXU truncates f32 matmul inputs to bf16; a row-pick one-hot matmul
    against (hi, mid, lo) where hi = bf16(T), mid = bf16(T - hi),
    lo = T - hi - mid reproduces the f32 gather BIT-exactly (measured on
    real RFMIP level temperatures; two terms leave 7.5e-6 relative, one
    term 3.8e-3). dtp zero-padded to ntab rows (row ntab-1 never picked:
    i0 <= ntab-2)."""
    tp = jnp.asarray(totplnk, jnp.float32)
    return split3_bf16(paired_diff_table(tp.T))


def _dot3split(x, oh):
    """Exact one-hot band->gpt expansion on the MXU: the f32 operand is
    split into three bf16-representable terms (hi + mid + lo == x exactly)
    so the truncating MXU dot against the 0/1 one-hot reproduces the f32
    gather to <=1 ulp (same trick as planck_interp_table, but for RUNTIME
    data instead of a constant table)."""
    f32 = jnp.float32
    hi, mid, lo = split3_bf16(x)
    return (jnp.dot(hi, oh, preferred_element_type=f32)
            + jnp.dot(mid, oh, preferred_element_type=f32)
            + jnp.dot(lo, oh, preferred_element_type=f32))


def _dot2split(x, oh):
    """2-term variant of ``_dot3split``: drops the lo term (7.5e-6
    relative on the MXU -- the probed 2-term table-split error; exact on
    CPU where the dot is f32). Round-5 chip numbers
    (scripts/probe_band_expand.py, 28.8k cols): the SW all-sky kernel's
    three cloud expansions cost 18.39 -> 16.15 ms with a max per-column
    flux delta of 2.5e-3 W/m2 (25x under the accepted mixed-precision
    bound); every EXACT reformulation tried (packed-K single pass,
    explicit-bf16 3-pass, lane broadcast/concat, jnp.repeat) measured
    SLOWER or failed to compile -- the cost is per-dot operand relayout,
    not MXU passes. The LW kernel's single expansion site is a wash
    (+-0.05 ms), so LW keeps the exact 3-term form."""
    f32 = jnp.float32
    hi = x.astype(jnp.bfloat16).astype(f32)
    mid = x - hi
    return (jnp.dot(hi, oh, preferred_element_type=f32)
            + jnp.dot(mid, oh, preferred_element_type=f32))


def pick_tile_c(ncol: int, default: int, candidates: tuple) -> int:
    """Choose the Pallas grid column tile: keep ``default`` when it divides
    ``ncol`` (28.8k/57.6k), else the first measured-preference candidate
    that does. A non-dividing tile makes every fused input pay a ceil-pad
    copy (XLA pad of (nlay, ncol, lanes) to the tile multiple): at 1800
    cols that pad is 78 us of the LW core's 593 us device time (r5s3
    profiler trace + resident-slope tile probe: LW 0.599 ms @32 -> 0.540
    @120, SW 0.754 @48 -> 0.727 @72, all-sky LW 0.732 @32 -> 0.702 @72,
    all-sky SW 0.945 @32 -> 0.902 @40; fluxes bit-identical). Falls back
    to ``default`` (ragged last tile) when nothing divides."""
    if ncol % default == 0:
        return default
    for t in candidates:
        if ncol % t == 0:
            return t
    return default


def cloud_lut_pack(co):
    """Host-side prep for IN-KERNEL cloud optics: per phase (liquid, ice)
    the combined [ext|ssa|asy | forward diffs] LUT block split into three
    bf16-representable terms (exact on the MXU, see planck_interp_table),
    plus the radius-grid geometry. co: extensions.cloud_optics.CloudOptics
    (LUT flavor; reference mo_cloud_optics.F90 compute_all_from_table)."""
    def pack(ext, ssa, asy):
        return split3_bf16(paired_diff_table(ext, ssa, asy))

    liq = pack(co.lut_extliq, co.lut_ssaliq, co.lut_asyliq)
    ice = pack(co.lut_extice[co.icergh - 1], co.lut_ssaice[co.icergh - 1],
               co.lut_asyice[co.icergh - 1])
    n_liq = liq[0].shape[0]
    n_ice = ice[0].shape[0]
    geom = (
        float(co.radliq_lwr),
        float((co.radliq_upr - co.radliq_lwr) / (n_liq - 1)),
        float(co.radice_lwr),
        float((co.radice_upr - co.radice_lwr) / (n_ice - 1)),
    )
    return liq, ice, geom


def _cloud_lut_interp(wp, re, t_hi, t_mid, t_lo, nsteps, nband, offset, step):
    """In-kernel cloud LUT lerp -> (t, t*ssa, t*ssa*g) at band resolution.
    Mirrors extensions.cloud_optics._from_table's f32 matmul path (same
    index/fraction semantics, same masking and product grouping)."""
    f32 = jnp.float32
    fidx = (re - offset) / step                  # (rows, 1)
    i0 = jnp.clip(jnp.floor(fidx), 0.0, float(nsteps - 2))
    frac = fidx - i0
    k = jax.lax.broadcasted_iota(
        jnp.int32, (re.shape[0], nsteps), 1).astype(f32)
    oh0 = (k == i0).astype(f32)                  # exact 0/1 row pick
    g = ((jnp.dot(oh0, t_hi, preferred_element_type=f32)
          + jnp.dot(oh0, t_mid, preferred_element_type=f32))
         + jnp.dot(oh0, t_lo, preferred_element_type=f32))
    vals = g[:, :3 * nband] + frac * g[:, 3 * nband:]
    e_v = vals[:, :nband]
    s_v = vals[:, nband:2 * nband]
    a_v = vals[:, 2 * nband:]
    t = jnp.where(wp > 0.0, wp * e_v, 0.0)
    ts = t * s_v
    tsg = ts * a_v
    return t, ts, tsg


def _planck_interp3(t_col, tp_hi, tp_mid, tp_lo, ntab, nband, t_min, t_delta):
    """Exact in-kernel totplnk lerp (see planck_interp_table). Edge
    semantics match reference interpolate1D (index clamped, fraction
    val0 - trunc(val0) UNclamped -- mo_gas_optics_kernels.F90:1024-1044)."""
    f32 = jnp.float32
    val0 = (t_col - t_min) / t_delta            # (rows', 1)
    tr = jnp.trunc(val0)
    i0 = jnp.clip(tr, 0.0, float(ntab - 2))
    frac = val0 - tr
    k = jax.lax.broadcasted_iota(
        jnp.int32, (t_col.shape[0], ntab), 1).astype(f32)
    oh0 = (k == i0).astype(f32)                 # exact 0/1 row pick
    g = (jnp.dot(oh0, tp_hi, preferred_element_type=f32)
         + jnp.dot(oh0, tp_mid, preferred_element_type=f32)
         + jnp.dot(oh0, tp_lo, preferred_element_type=f32))
    return g[:, :nband] + frac * g[:, nband:]


def _planck_interp_cat(t_col, tp_cat, ntab, nband, t_min, t_delta):
    """_planck_interp3 with the three bf16 split terms CONCATENATED along
    the table's output dim (tp_cat = [hi | mid | lo], (ntab, 3*2*nband)):
    one one-hot matmul instead of three. Each 2*nband=32-wide term padded
    its MXU N dim to 128 lanes (4x wasted work, x3 dots -- the kernel
    ablation attributed 10.6 of 24.3 ms at 57.6k cols to this interp);
    fused, one N=96 dot does all three terms. The per-term lane slices are
    added in the SAME ((hi + mid) + lo) order, so results are bit-identical
    to the 3-dot form."""
    f32 = jnp.float32
    w = 2 * nband
    val0 = (t_col - t_min) / t_delta            # (rows', 1)
    tr = jnp.trunc(val0)
    i0 = jnp.clip(tr, 0.0, float(ntab - 2))
    frac = val0 - tr
    k = jax.lax.broadcasted_iota(
        jnp.int32, (t_col.shape[0], ntab), 1).astype(f32)
    oh0 = (k == i0).astype(f32)                 # exact 0/1 row pick
    g3 = jnp.dot(oh0, tp_cat, preferred_element_type=f32)
    g = (g3[:, :w] + g3[:, w:2 * w]) + g3[:, 2 * w:]
    return g[:, :nband] + frac * g[:, nband:]


def _mega4_kernel(nlay, ngpt, nband, n2d, nc, ntab, n_cld, lut, tile_c,
                  d_secant, two_pi_w, tau_thresh, t_min, t_delta, unroll,
                  sweep_stored,
                  fused_ref, const_ref, tsfc_ref, tlevb_ref, emis_ref,
                  w1a_ref, w1c_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  omean_ref, ostd_ref, oh_ref, tpcat_ref,
                  cliq_hi, cliq_mid, cliq_lo, cice_hi, cice_mid, cice_lo,
                  up_ref, dn_ref,
                  trans_scr, sdn_scr, sup_scr, dn_acc, up_acc):
    f32 = jnp.float32
    rows = nlay * tile_c
    o_cd = n2d            # fused lanes: [x2d | col_dry | tlay | tlev_t]
    o_tlay = n2d + 1
    o_top = n2d + 2

    tpcat = tpcat_ref[:, :]
    oh = oh_ref[:, :]
    interp = functools.partial(
        _planck_interp_cat, tp_cat=tpcat,
        ntab=ntab, nband=nband, t_min=t_min, t_delta=t_delta)

    # ---- phase A: feature assembly + MLP + sources -> scratch ------------
    ff = fused_ref[:, :, :].reshape(rows, fused_ref.shape[-1])
    # first GEMM split x@W1 = x2d@W1a + const@W1c: the constant-per-column
    # contribution is one (tile, nc)x(nc, h) matmul broadcast across layers
    # -- no lane-dim concat, and the const features do per-tile (not
    # per-row) MXU work
    hc = jnp.dot(const_ref[:, :], w1c_ref[:, :], preferred_element_type=f32)
    hc_rows = jnp.broadcast_to(
        hc[None, :, :], (nlay, tile_c, hc.shape[-1])
    ).reshape(rows, hc.shape[-1])
    h = _softsign(jnp.dot(ff[:, :n2d], w1a_ref[:, :],
                          preferred_element_type=f32)
                  + hc_rows + b1_ref[0, :])
    h = _softsign(jnp.dot(h, w2_ref[:, :], preferred_element_type=f32)
                  + b2_ref[0, :])
    y = jnp.dot(h, w3_ref[:, :], preferred_element_type=f32) + b3_ref[0, :]
    yt = ostd_ref[0, :ngpt] * y[:, :ngpt] + omean_ref[0, :ngpt]
    y2 = yt * yt
    y4 = y2 * y2
    if lut is not None:
        # all-sky, FULLY in-kernel cloud optics: 4 physical lanes
        # (lwp, iwp, rel, rei) -> LUT lerp -> absorption tau -> band->gpt
        # expansion, all VMEM-resident (extensions/cloud_optics.py
        # _from_table + the as_2str=False combine, same groupings)
        n_liq, n_ice, liq_off, liq_step, ice_off, ice_step = lut
        o_cld = o_top + 1
        lt, lts, _ = _cloud_lut_interp(
            ff[:, o_cld:o_cld + 1], ff[:, o_cld + 2:o_cld + 3],
            cliq_hi[:, :], cliq_mid[:, :], cliq_lo[:, :],
            n_liq, nband, liq_off, liq_step)
        it_, its, _ = _cloud_lut_interp(
            ff[:, o_cld + 1:o_cld + 2], ff[:, o_cld + 3:o_cld + 4],
            cice_hi[:, :], cice_mid[:, :], cice_lo[:, :],
            n_ice, nband, ice_off, ice_step)
        tau_cld = _dot3split((lt - lts) + (it_ - its), oh)
        tl = ((y4 * y4) * ff[:, o_cd:o_cd + 1] + tau_cld) * d_secant
    elif n_cld:
        # all-sky: fold the band-resolved cloud absorption tau into the gas
        # tau BEFORE the diffusivity scaling (same grouping as the staged
        # all-sky core: (tau_gas + expand(tau_cld)) * D)
        o_cld = o_top + 1
        tau_cld = _dot3split(ff[:, o_cld:o_cld + n_cld], oh)
        tl = ((y4 * y4) * ff[:, o_cd:o_cd + 1] + tau_cld) * d_secant
    else:
        tl = (y4 * y4) * ff[:, o_cd:o_cd + 1] * d_secant
    pf = y[:, ngpt:2 * ngpt]
    pf = pf * pf

    trans = jnp.exp(-tl)
    fact = _source_fact(tl, trans, tau_thresh)
    # NOTE (measured dead end): stacking the interp sites along rows
    # (concat lay+lev temps -> one one-hot build + one matmul) CRASHES the
    # Mosaic compiler (remote tpu_compile_helper exit 1 after a minutes-
    # long attempt, both ragged 2*rows+2*tile and uniform 2*rows forms).
    # The interp sites stay separate; the 3-term fusion lives in the N dim
    # instead (_planck_interp_cat).
    lay = pf * jnp.dot(interp(ff[:, o_tlay:o_tlay + 1]), oh,
                       preferred_element_type=f32)
    lev_t = pf * jnp.dot(interp(ff[:, o_top:o_top + 1]), oh,
                         preferred_element_type=f32)
    # lev_b(l) = pf(l+1) * B(tlev[l+1]) == lev_t(l+1) for l < nlay-1: ROLL
    # the finished lev_t product one layer up instead of running a third
    # full-width table interp + band->gpt dot (bit-exact: the same floats
    # move rows). The bottom layer (level nlay, own pfrac -- reference
    # mo_gas_optics_kernels.F90:676-683) is fixed up below with one
    # (tile_c,)-row interp.
    lev_b = pltpu.roll(lev_t, rows - tile_c, axis=0)
    one_m_t = 1.0 - trans
    two_fact = 2.0 * fact
    trans_scr[:, :, :] = trans.reshape(nlay, tile_c, ngpt)
    sdn_scr[:, :, :] = (one_m_t * lev_b + two_fact * (lay - lev_b)).reshape(
        nlay, tile_c, ngpt)
    sup_scr[:, :, :] = (one_m_t * lev_t + two_fact * (lay - lev_t)).reshape(
        nlay, tile_c, ngpt)
    bsl = slice((nlay - 1) * tile_c, None)
    bot = pf[bsl] * jnp.dot(interp(tlevb_ref[:, :]), oh,
                            preferred_element_type=f32)
    sdn_scr[nlay - 1, :, :] = (one_m_t[bsl] * bot
                               + two_fact[bsl] * (lay[bsl] - bot))
    sfc_source = pf[bsl] * jnp.dot(
        interp(tsfc_ref[:, :]), oh, preferred_element_type=f32)

    if sweep_stored:
        # ---- stored-sweep variant: the per-step cross-lane jnp.sum is
        # hoisted out of the recurrence. Each sweep overwrites its (dead
        # after use) source scratch with the spectral radiance, and the
        # broadband reduction runs ONCE over the whole (nlay, tile, ngpt)
        # block after the loop -- identical floats summed over the same
        # lane axis, so bit-exact vs the fused form; the loop body shrinks
        # to one fma per layer.
        def down_s(l, rad):
            rad = trans_scr[l] * rad + sdn_scr[l]
            sdn_scr[l] = rad
            return rad

        rad = jnp.zeros((tile_c, ngpt), f32)
        rad = jax.lax.fori_loop(0, nlay, down_s, rad, unroll=unroll)
        dn_acc[pl.ds(0, 1), :] = jnp.zeros((1, tile_c), f32)
        dn_acc[pl.ds(1, nlay), :] = jnp.sum(
            sdn_scr[:, :, :], axis=2) * two_pi_w

        emis = emis_ref[:, :]
        rad = rad * (1.0 - emis) + emis * sfc_source
        up_acc[pl.ds(nlay, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]

        def up_s(i, rad):
            l = nlay - 1 - i
            rad = trans_scr[l] * rad + sup_scr[l]
            sup_scr[l] = rad
            return rad

        jax.lax.fori_loop(0, nlay, up_s, rad, unroll=unroll)
        up_acc[pl.ds(0, nlay), :] = jnp.sum(
            sup_scr[:, :, :], axis=2) * two_pi_w

        dn_ref[:, :] = jnp.transpose(dn_acc[:, :], (1, 0))
        up_ref[:, :] = jnp.transpose(up_acc[:, :], (1, 0))
        return

    # ---- phase B: top-down sweep (VPU, VMEM-resident) -------------------
    def down(l, rad):
        rad = trans_scr[l] * rad + sdn_scr[l]
        dn_acc[pl.ds(l + 1, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    rad = jnp.zeros((tile_c, ngpt), f32)
    dn_acc[pl.ds(0, 1), :] = jnp.zeros((1, tile_c), f32)
    rad = jax.lax.fori_loop(0, nlay, down, rad, unroll=unroll)

    # ---- phase C: surface + bottom-up sweep ------------------------------
    emis = emis_ref[:, :]
    rad = rad * (1.0 - emis) + emis * sfc_source
    up_acc[pl.ds(nlay, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]

    def up(i, rad):
        l = nlay - 1 - i
        rad = trans_scr[l] * rad + sup_scr[l]
        up_acc[pl.ds(l, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    jax.lax.fori_loop(0, nlay, up, rad, unroll=unroll)

    dn_ref[:, :] = jnp.transpose(dn_acc[:, :], (1, 0))
    up_ref[:, :] = jnp.transpose(up_acc[:, :], (1, 0))


def lw_clearsky_mega4(
    model,
    x2d,              # SCALED layer-varying features: list of (nlay, ncol)
                      #   lanes (preferred: one fused concat) or a single
                      #   (nlay, ncol, n2d) array
    const_feats,      # (ncol, nc) SCALED constant-per-column features
    w1a,              # (n2d, h) first-layer weight rows for the x2d lanes
    w1c,              # (nc, h) first-layer weight rows for the const block
    col_dry,          # (nlay, ncol)
    tlay,             # (nlay, ncol) raw [K]
    tlev,             # (nlay+1, ncol) raw [K]
    tsfc,             # (ncol,) raw [K]
    planck_table,     # gasoptics.planck.PlanckTable
    one_hot,          # (nband, ngpt)
    sfc_emis,         # (ncol, ngpt)
    d_secant: float = 1.66,
    weight: float = 0.5,
    tile_c: int = 64,
    unroll: int | None = None,
    interpret: bool | None = None,
    cld_tau_band=None,  # (nlay, ncol, nband) cloud absorption tau, or None
    cld_fields=None,    # (lwp, iwp, rel, rei) each (nlay, ncol): in-kernel
                        #   cloud-optics LUT path (needs cld_lut)
    cld_lut=None,       # cloud_lut_pack(co) result for cld_fields
    sweep_stored: bool = False,  # hoist broadband sums out of the sweeps
    assembly: str = "concat",   # fused-input assembly: "concat" (XLA
                                #   DUS-concat; clear-sky measured best) or
                                #   "stack" (lane-major stack + barrier +
                                #   one transpose copy; the all-sky LUT
                                #   driver measured XLA mis-scheduling the
                                #   26-lane concat into per-lane relayouts)
):
    """Fully fused LW clear-sky pipeline, v4: thin-lane inputs, everything
    else in-kernel. Over mega3 it moves the Planck-table interpolation
    (exact three-term bf16 split, see planck_interp_table) into the
    kernel, so the staged XLA prep drops the three band-Planck interps and
    shrinks the fused input to n2d+3 (~21) lanes. Round 3 removes the
    third in-kernel interp as well: lev_b is the lev_t product rolled one
    layer (bit-exact, see _mega4_kernel), leaving two (rows, ntab) interp
    intermediates -- which also cuts the VMEM pressure that capped the
    tile at 32. Measured (full sweep unroll, the TPU default, 3-interp
    variant): 2.15 ms at 1800 cols / 27.2 ms at 57.6k (unroll=1:
    2.72/44.8; staged 3.7/89.3, mega3 3.57/89.3) at tile_c=32.

    The const_feats/w1c per-tile GEMM exists for MISSING gases (scenario
    reference VMRs). Routing the present-but-layer-constant gases through
    it as well measured SLOWER (69.5 vs 44.6 ms at 57.6k) and numerically
    noisier (bf16 product grouping changes, ~0.1 W/m2 vs staged, though
    equally accurate against f64) -- keep real gases as lanes.

    Physics identical to predict_nn_lw + compute_planck_source_nn +
    lw_solver_noscat broadband (reference mo_gas_optics_kernels.F90:690-862,
    615-683; mo_rte_solver_kernels.F90:119-330). Single angle, zero
    incident flux, f32, 3-layer softsign 'lw_both' model.

    cld_tau_band turns the kernel into the ALL-SKY LW pipeline: the
    band-resolved cloud absorption tau rides nband extra input lanes and is
    expanded band->gpt in-kernel by an exact 3-term-split one-hot matmul
    (_dot3split), then folded into the gas tau before the transport --
    equivalent to increment(OpticalProps1scl) + lw_solver_noscat (reference
    mo_optical_props_kernels.F90 increment_1scalar_by_1scalar_bybnd +
    rrtmgp_allsky.F90 LW branch) with no (nlay, ncol, ngpt) HBM staging.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if unroll is None:
        # Mosaic supports only unroll=1 or full; fully unrolling the two
        # transport sweeps removes per-iteration loop/index overhead
        # (measured 44.8->27.2 ms at 57.6k cols, 2.71->2.15 ms at 1800,
        # bit-exact). Interpret mode keeps 1 (trace bloat on CPU).
        nlay_u = x2d[0].shape[0] if isinstance(x2d, (list, tuple)) else x2d.shape[0]
        unroll = 1 if interpret else nlay_u
    nc = const_feats.shape[-1]
    nband, ngpt = one_hot.shape
    f32 = jnp.float32
    # the three split terms concatenated along N: ONE one-hot matmul per
    # interp instead of three (see _planck_interp_cat)
    tp_cat = jnp.concatenate(planck_interp_table(planck_table.totplnk),
                             axis=1)
    ntab = tp_cat.shape[0]

    lanes2d = None
    if isinstance(x2d, (list, tuple)):
        n2d = len(x2d)
        nlay, ncol = x2d[0].shape
        lanes2d = [
            *(l.astype(f32) for l in x2d),
            col_dry.astype(f32),
            tlay.astype(f32),
            tlev[:-1].astype(f32),
        ]
        parts = [l[..., None] for l in lanes2d]
    else:
        nlay, ncol, n2d = x2d.shape
        parts = [
            x2d.astype(f32),
            col_dry.astype(f32)[..., None],
            tlay.astype(f32)[..., None],
            tlev[:-1].astype(f32)[..., None],
        ]
    n_cld = 0
    lut_static = None
    if cld_fields is not None:
        if cld_lut is None:
            raise ValueError("cld_fields requires cld_lut (cloud_lut_pack)")
        liq3, ice3, geom = cld_lut
        parts += [c.astype(f32)[..., None] for c in cld_fields]
        if lanes2d is not None:
            lanes2d += [c.astype(f32) for c in cld_fields]
        lut_static = (liq3[0].shape[0], ice3[0].shape[0], *geom)
    elif cld_tau_band is not None:
        n_cld = cld_tau_band.shape[-1]
        parts.append(cld_tau_band.astype(f32))
        lanes2d = None  # 3-D cloud lanes: only the concat form applies
    if lut_static is None:
        z = jnp.zeros((1, 1), f32)
        liq3 = ice3 = (z, z, z)
    if assembly == "stack" and lanes2d is not None:
        # ONE contiguous lane-major stack behind a barrier + ONE transpose
        # copy into the operand layout (see sw_megakernel: stops XLA from
        # splitting the assembly into per-lane tile-padded relayouts).
        # Measured per path: LOSES for clear-sky LW (1.97 -> 2.41 ms at
        # 1800, 20.1 -> 20.7 at 57.6k, where XLA's DUS-concat is already
        # near-BW) but WINS for the 26-lane all-sky LUT core, where XLA
        # emits 22 x 0.86 ms lane relayouts + a 13.3 ms padded concat
        # (round-4 trace at 28.8k cols).
        big = jax.lax.optimization_barrier(jnp.stack(lanes2d, axis=0))
        fused = jnp.transpose(big, (1, 2, 0))
    else:
        # ONE concatenate: a second concat would materialize the whole
        # fused block twice (0.6 ms of the LW all-sky staging at 1800 cols)
        fused = jnp.concatenate(parts, axis=-1)
    nfu = fused.shape[-1]
    const_feats = const_feats.astype(f32)
    tsfc2 = tsfc.astype(f32)[:, None]
    tlevb2 = tlev[-1].astype(f32)[:, None]  # bottom level for the fixup row

    cpad = (-ncol) % tile_c
    if cpad:
        fused = jnp.pad(fused, ((0, 0), (0, cpad), (0, 0)))
        const_feats = jnp.pad(const_feats, ((0, cpad), (0, 0)))
        tsfc2 = jnp.pad(tsfc2, ((0, cpad), (0, 0)))
        tlevb2 = jnp.pad(tlevb2, ((0, cpad), (0, 0)))
        sfc_emis = jnp.pad(sfc_emis, ((0, cpad), (0, 0)))
    n = fused.shape[1]
    grid = (n // tile_c,)

    _, w2, w3 = model.weights
    b1, b2, b3 = model.biases
    row2 = lambda a: jnp.asarray(a, f32).reshape(1, -1)
    tau_thresh = float(np.sqrt(np.finfo(np.float32).eps))
    two_pi_w = 2.0 * np.pi * weight

    col2 = lambda d: pl.BlockSpec((tile_c, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    rep = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                   memory_space=pltpu.VMEM)
    out_bs = pl.BlockSpec((tile_c, nlay + 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _mega4_kernel, nlay, ngpt, nband, n2d, nc, ntab, n_cld, lut_static,
        tile_c, d_secant, two_pi_w, tau_thresh,
        float(planck_table.temp_ref_min), float(planck_table.totplnk_delta),
        unroll, sweep_stored,
    )
    up, dn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nlay, tile_c, nfu), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            col2(nc), col2(1), col2(1), col2(ngpt),
            rep(w1a.shape), rep(w1c.shape), rep((1, b1.shape[0])),
            rep(w2.shape), rep((1, b2.shape[0])),
            rep(w3.shape), rep((1, b3.shape[0])),
            rep((1, model.output_mean.shape[0])),
            rep((1, model.output_std.shape[0])),
            rep(one_hot.shape),
            rep((ntab, 6 * nband)),
            *(rep(t.shape) for t in (*liq3, *ice3)),
        ],
        out_specs=(out_bs, out_bs),
        out_shape=(
            jax.ShapeDtypeStruct((n, nlay + 1), f32),
            jax.ShapeDtypeStruct((n, nlay + 1), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay + 1, tile_c), f32),
            pltpu.VMEM((nlay + 1, tile_c), f32),
        ],
        # tiles > 32 exceed the 16 MiB default Mosaic budget (scratch +
        # (rows, ntab) interp one-hots scale with the tile); v5e has
        # 128 MiB of VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        fused, const_feats, tsfc2, tlevb2, sfc_emis.astype(f32),
        w1a.astype(f32), w1c.astype(f32), row2(b1), w2.astype(f32), row2(b2),
        w3.astype(f32), row2(b3),
        row2(model.output_mean), row2(model.output_std),
        one_hot.astype(f32), tp_cat,
        *liq3, *ice3,
    )
    return up[:ncol], dn[:ncol]


def _mega5_kernel(nlay, ngpt, nband, n2d, nc, ntab, tf_codes, tile_c,
                  d_secant, two_pi_w, tau_thresh, t_min, t_delta, unroll,
                  mxu_trunc, mxu_first, *refs):
    """mega5: separate RAW input lanes, transform+scale in-kernel.

    refs layout (matches lw_clearsky_mega5's pallas_call):
      lanes[n2d] (nlay, tile_c) raw | col_dry (nlay, tile_c) |
      tlev (nlay+1, tile_c) | const (tile_c, nc) | tsfc (tile_c, 1) |
      emis (tile_c, ngpt) | scale (2, n2d) [mn; inv] |
      w1a (n2d, h) w1c b1 w2 b2 w3 b3 | omean ostd | one_hot |
      tp_hi tp_mid tp_lo | outs up dn | scratch trans sdn sup dn_acc up_acc

    Every elementwise stage runs on (nlay, tile_c, X) 3-D blocks so the
    (nlay, tile_c) per-row quantities (col_dry, interp fractions) broadcast
    over the lane axis with NO (rows, 1) relayouts; MXU dots see the free
    (nlay*tile_c, X) collapse of the same buffers."""
    f32 = jnp.float32
    rows = nlay * tile_c
    i = 0
    lane_refs = refs[i:i + n2d]; i += n2d
    cd_ref = refs[i]; i += 1
    tlev_ref = refs[i]; i += 1
    const_ref = refs[i]; i += 1
    tsfc_ref = refs[i]; i += 1
    emis_ref = refs[i]; i += 1
    sc_ref = refs[i]; i += 1
    (w1a_ref, w1c_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
     omean_ref, ostd_ref, oh_ref, tphi_ref, tpmid_ref, tplo_ref,
     up_ref, dn_ref,
     trans_scr, sdn_scr, sup_scr, dn_acc, up_acc) = refs[i:]

    oh = oh_ref[:, :]
    tphi = tphi_ref[:, :]
    tpmid = tpmid_ref[:, :]
    tplo = tplo_ref[:, :]

    # ---- phase A1: first layer as rank-1 lane accumulation ---------------
    # (no (rows, n2d) feature matrix is ever built: each raw lane is
    # transformed, scaled, and folded into h3 with one VPU broadcast-fma)
    hc = jnp.dot(const_ref[:, :], w1c_ref[:, :], preferred_element_type=f32)
    bf = jnp.bfloat16
    scaled = []
    for l, code in enumerate(tf_codes):
        x = lane_refs[l][:, :]                      # (nlay, tile_c) raw
        if code == 1:
            x = jnp.log(x)
        elif code == 2:
            x = jnp.sqrt(jnp.sqrt(x))
        scaled.append((x - sc_ref[0, l]) * sc_ref[1, l])
    if mxu_first:
        # mega6: stack the scaled lanes into the (rows, n2d) feature
        # matrix IN VMEM (a tile-local relayout, n2d * 60 KiB at tile
        # 128) and run the first layer on the MXU exactly like mega4 /
        # the staged MLP -- same dot, same bf16 truncation, so the
        # numerics match the other paths without the per-lane rounding
        # emulation the rank-1 form needs.
        ff = jnp.stack(scaled, axis=-1).reshape(rows, n2d)
        hc_rows = jnp.broadcast_to(
            hc[None, :, :], (nlay, tile_c, hc.shape[-1])
        ).reshape(rows, hc.shape[-1])
        h = _softsign(jnp.dot(ff, w1a_ref[:, :], preferred_element_type=f32)
                      + hc_rows + b1_ref[0, :])
    else:
        h3 = jnp.broadcast_to(hc[None, :, :], (nlay, tile_c, hc.shape[-1]))
        h3 = h3 + b1_ref[0, :][None, None, :]
        for l, xs in enumerate(scaled):
            wrow = w1a_ref[l, :]
            if mxu_trunc:
                # match the MXU paths (staged MLP / mega4): an f32 dot
                # truncates its inputs to bf16, so the VPU rank-1
                # accumulation must round both operands identically or the
                # **8 tau postprocessing turns the f32-vs-bf16 first layer
                # into ~1 W/m2 flux disagreements (measured on chip; the
                # full-f32 variant is *more* accurate but inconsistent with
                # every other path). Interpret-mode dots do NOT truncate,
                # so the emulation is TPU-only -- each backend
                # self-consistent.
                xs = xs.astype(bf).astype(f32)
                wrow = wrow.astype(bf).astype(f32)
            h3 = h3 + xs[:, :, None] * wrow[None, None, :]
        h = _softsign(h3.reshape(rows, h3.shape[-1]))
    h = _softsign(jnp.dot(h, w2_ref[:, :], preferred_element_type=f32)
                  + b2_ref[0, :])
    y = jnp.dot(h, w3_ref[:, :], preferred_element_type=f32) + b3_ref[0, :]
    yt = ostd_ref[0, :ngpt] * y[:, :ngpt] + omean_ref[0, :ngpt]
    y2 = yt * yt
    y4 = y2 * y2
    tau8 = (y4 * y4).reshape(nlay, tile_c, ngpt)
    tl = tau8 * (cd_ref[:, :] * d_secant)[:, :, None]
    pf = y[:, ngpt:2 * ngpt]
    pf3 = (pf * pf).reshape(nlay, tile_c, ngpt)

    trans = jnp.exp(-tl)
    fact = _source_fact(tl, trans, tau_thresh)

    # ---- phase A2: Planck interpolation in 3-D (free collapses for dots) -
    def interp3(t_ref, n0):
        t3 = t_ref[:, :]                            # (n0, tile_c)
        val0 = (t3 - t_min) / t_delta
        tr = jnp.trunc(val0)
        i0 = jnp.clip(tr, 0.0, float(ntab - 2))
        frac = val0 - tr                            # (n0, tile_c)
        k = jax.lax.broadcasted_iota(
            jnp.int32, (n0, tile_c, ntab), 2).astype(f32)
        oh0 = (k == i0[:, :, None]).astype(f32).reshape(n0 * tile_c, ntab)
        g = (jnp.dot(oh0, tphi, preferred_element_type=f32)
             + jnp.dot(oh0, tpmid, preferred_element_type=f32)
             + jnp.dot(oh0, tplo, preferred_element_type=f32)
             ).reshape(n0, tile_c, 2 * nband)
        b = g[:, :, :nband] + frac[:, :, None] * g[:, :, nband:]
        return jnp.dot(b.reshape(n0 * tile_c, nband), oh,
                       preferred_element_type=f32).reshape(n0, tile_c, ngpt)

    # tlay is lane 0 by construction (driver asserts input_names[0]=='tlay')
    blay = interp3(lane_refs[0], nlay)
    blev = interp3(tlev_ref, nlay + 1)              # all nlay+1 levels ONCE
    lay = pf3 * blay
    lev_t = pf3 * blev[:nlay]
    # lev_b(l) = pf(l+1) * B(tlev[l+1]); bottom layer reuses its own pfrac
    # (reference mo_gas_optics_kernels.F90:676-683)
    pf_b = jnp.concatenate([pf3[1:], pf3[nlay - 1:nlay]], axis=0)
    lev_b = pf_b * blev[1:]

    one_m_t = 1.0 - trans
    two_fact = 2.0 * fact
    trans_scr[:, :, :] = trans
    sdn_scr[:, :, :] = one_m_t * lev_b + two_fact * (lay - lev_b)
    sup_scr[:, :, :] = one_m_t * lev_t + two_fact * (lay - lev_t)

    # surface source: 2-D interp on the (tile_c, 1) surface temperature
    sfc_source = pf3[nlay - 1] * jnp.dot(
        _planck_interp3(tsfc_ref[:, :], tphi, tpmid, tplo,
                        ntab, nband, t_min, t_delta),
        oh, preferred_element_type=f32)

    # ---- phase B: top-down sweep (VPU, VMEM-resident) -------------------
    def down(l, rad):
        rad = trans_scr[l] * rad + sdn_scr[l]
        dn_acc[pl.ds(l + 1, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    rad = jnp.zeros((tile_c, ngpt), f32)
    dn_acc[pl.ds(0, 1), :] = jnp.zeros((1, tile_c), f32)
    rad = jax.lax.fori_loop(0, nlay, down, rad, unroll=unroll)

    # ---- phase C: surface + bottom-up sweep ------------------------------
    emis = emis_ref[:, :]
    rad = rad * (1.0 - emis) + emis * sfc_source
    up_acc[pl.ds(nlay, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]

    def up(i2, rad):
        l = nlay - 1 - i2
        rad = trans_scr[l] * rad + sup_scr[l]
        up_acc[pl.ds(l, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    jax.lax.fori_loop(0, nlay, up, rad, unroll=unroll)

    dn_ref[:, :] = jnp.transpose(dn_acc[:, :], (1, 0))
    up_ref[:, :] = jnp.transpose(up_acc[:, :], (1, 0))


def lw_clearsky_mega5(
    model,
    lanes,            # list of n2d RAW (nlay, ncol) layer-varying lanes;
                      #   lanes[0] MUST be tlay (reused for the lay interp)
    tf_codes,         # tuple of per-lane transforms: 0 id, 1 log, 2 x^1/4
    scale_rows,       # (2, n2d) [input_min; 1/(max-min)] rows
    const_feats,      # (ncol, nc) SCALED constant-per-column features
    w1a,              # (n2d, h) first-layer weight rows for the lanes
    w1c,              # (nc, h) first-layer weight rows for the const block
    col_dry,          # (nlay, ncol)
    tlev,             # (nlay+1, ncol) raw [K]
    tsfc,             # (ncol,) raw [K]
    planck_table,
    one_hot,          # (nband, ngpt)
    sfc_emis,         # (ncol, ngpt)
    d_secant: float = 1.66,
    weight: float = 0.5,
    tile_c: int = 128,
    unroll: int | None = None,
    interpret: bool | None = None,
    mxu_first: bool = False,
):
    """Fully fused LW pipeline, v5: SEPARATE raw input lanes.

    mega4's single fused (nlay, ncol, ~22) input pays a hidden 6x HBM tax:
    XLA tiles the minor two dims (8, 128), so 22 lanes pad to 128 -- the
    staged concat writes ~1.8 GB at 57.6k columns and the kernel DMAs the
    same padded bytes back in. mega5 passes each (nlay, ncol) lane as its
    own well-tiled 2-D array (no concat, no pad) and moves the feature
    transform+scaling INTO the kernel: the first MLP layer accumulates
    rank-1 lane contributions on the VPU, so the (rows, n2d) feature
    matrix never exists anywhere. The tlev lanes collapse into one
    (nlay+1, ncol) ref interpolated once for all levels (lev_b = slice,
    not roll+fixup). Physics identical to mega4 (same expressions; lane
    scaling is sub-then-multiply, <=1 ulp vs the staged divide).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nlay, ncol = lanes[0].shape
    n2d = len(lanes)
    nc = const_feats.shape[-1]
    nband, ngpt = one_hot.shape
    f32 = jnp.float32
    if unroll is None:
        unroll = 1 if interpret else nlay
    if not interpret and tile_c % 128:
        # Mosaic requires 2-D block minor dims to be lane-aligned; full
        # 128-lane tiles also make every lane DMA a whole-tile burst.
        raise ValueError(f"mega5 tile_c must be a multiple of 128 on TPU "
                         f"(got {tile_c})")
    tp_hi, tp_mid, tp_lo = planck_interp_table(planck_table.totplnk)
    ntab = tp_hi.shape[0]

    lanes = [l.astype(f32) for l in lanes]
    col_dry = col_dry.astype(f32)
    tlev = tlev.astype(f32)
    const_feats = const_feats.astype(f32)
    tsfc2 = tsfc.astype(f32)[:, None]

    cpad = (-ncol) % tile_c
    if cpad:
        pad2 = lambda a: jnp.pad(a, ((0, 0), (0, cpad)), mode="edge")
        lanes = [pad2(l) for l in lanes]
        col_dry = pad2(col_dry)
        tlev = pad2(tlev)
        const_feats = jnp.pad(const_feats, ((0, cpad), (0, 0)), mode="edge")
        tsfc2 = jnp.pad(tsfc2, ((0, cpad), (0, 0)), mode="edge")
        sfc_emis = jnp.pad(sfc_emis, ((0, cpad), (0, 0)))
    n = lanes[0].shape[1]
    grid = (n // tile_c,)

    _, w2, w3 = model.weights
    b1, b2, b3 = model.biases
    row2 = lambda a: jnp.asarray(a, f32).reshape(1, -1)
    tau_thresh = float(np.sqrt(np.finfo(np.float32).eps))
    two_pi_w = 2.0 * np.pi * weight

    lane_bs = pl.BlockSpec((nlay, tile_c), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    lev_bs = pl.BlockSpec((nlay + 1, tile_c), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    col2 = lambda d: pl.BlockSpec((tile_c, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    rep = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                   memory_space=pltpu.VMEM)
    out_bs = pl.BlockSpec((tile_c, nlay + 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _mega5_kernel, nlay, ngpt, nband, n2d, nc, ntab, tuple(tf_codes),
        tile_c, d_secant, two_pi_w, tau_thresh,
        float(planck_table.temp_ref_min), float(planck_table.totplnk_delta),
        unroll, not interpret, mxu_first,
    )
    up, dn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            *([lane_bs] * n2d),
            lane_bs,                 # col_dry
            lev_bs,                  # tlev
            col2(nc), col2(1), col2(ngpt),
            rep((2, n2d)),
            rep(w1a.shape), rep(w1c.shape), rep((1, b1.shape[0])),
            rep(w2.shape), rep((1, b2.shape[0])),
            rep(w3.shape), rep((1, b3.shape[0])),
            rep((1, model.output_mean.shape[0])),
            rep((1, model.output_std.shape[0])),
            rep(one_hot.shape),
            rep((ntab, 2 * nband)), rep((ntab, 2 * nband)),
            rep((ntab, 2 * nband)),
        ],
        out_specs=(out_bs, out_bs),
        out_shape=(
            jax.ShapeDtypeStruct((n, nlay + 1), f32),
            jax.ShapeDtypeStruct((n, nlay + 1), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay + 1, tile_c), f32),
            pltpu.VMEM((nlay + 1, tile_c), f32),
        ],
        # tile 128 needs ~3x the 16 MiB default Mosaic budget (scratch
        # 11.3 MiB + interp one-hots); v5e has 128 MiB of VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        *lanes, col_dry, tlev, const_feats, tsfc2, sfc_emis.astype(f32),
        jnp.asarray(scale_rows, f32),
        w1a.astype(f32), w1c.astype(f32), row2(b1), w2.astype(f32), row2(b2),
        w3.astype(f32), row2(b3),
        row2(model.output_mean), row2(model.output_std),
        one_hot.astype(f32), tp_hi, tp_mid, tp_lo,
    )
    return up[:ncol], dn[:ncol]


