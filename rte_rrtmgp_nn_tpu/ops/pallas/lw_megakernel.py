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

Phasing inside one grid step (one column tile):
  A. per-layer MLP (three GEMMs + softsign, MXU) -> tau, pfrac scratch;
  B. top-down sweep: sources from pfrac x (band Planck @ one-hot), exp,
     linear-in-tau, radiance carry, in-register broadband reduction;
  C. surface reflection/emission, bottom-up sweep likewise.

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


def _softsign(x):
    return x / (1.0 + jnp.abs(x))


def _mega_kernel(nlay, ngpt, nband, nf, d_secant, two_pi_w, tau_thresh,
                 fused_ref, pls_ref, emis_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 omean_ref, ostd_ref, oh_ref,
                 up_ref, dn_ref, tau_scr, pf_scr, dn_acc, up_acc):
    f32 = jnp.float32
    o_lay = nf + 1          # fused lane offsets: [x | col_dry | B_lay | B_lev_top | B_lev_bot]
    o_top = o_lay + nband
    o_bot = o_top + nband

    w1 = w1_ref[:, :]
    b1 = b1_ref[0, :]
    w2 = w2_ref[:, :]
    b2 = b2_ref[0, :]
    w3 = w3_ref[:, :]
    b3 = b3_ref[0, :]
    omean = omean_ref[0, :ngpt]
    ostd = ostd_ref[0, :ngpt]
    oh = oh_ref[:, :]

    # ---- phase A: per-layer MLP -> tau, pfrac in VMEM scratch ----------
    def mlp_layer(l, _):
        f = fused_ref[l]                      # (tile, nfu)
        x = f[:, :nf]
        h = _softsign(jnp.dot(x, w1, preferred_element_type=f32) + b1)
        h = _softsign(jnp.dot(h, w2, preferred_element_type=f32) + b2)
        y = jnp.dot(h, w3, preferred_element_type=f32) + b3
        yt = ostd * y[:, :ngpt] + omean
        y2 = yt * yt
        y4 = y2 * y2
        tau_scr[l] = (y4 * y4) * f[:, nf:nf + 1]
        pf = y[:, ngpt:2 * ngpt]
        pf_scr[l] = pf * pf
        return 0

    jax.lax.fori_loop(0, nlay, mlp_layer, 0)

    def transport(l, rad, band_off, pf_lev_idx):
        tl = tau_scr[l] * d_secant
        trans = jnp.exp(-tl)
        tl_safe = jnp.where(tl > tau_thresh, tl, 1.0)
        fact = jnp.where(
            tl > tau_thresh,
            (1.0 - trans) / tl_safe - trans,
            tl * (0.5 - (1.0 / 3.0) * tl),
        )
        pf = pf_scr[l]
        f = fused_ref[l]
        lay = pf * jnp.dot(f[:, o_lay:o_top], oh, preferred_element_type=f32)
        levb = jnp.dot(f[:, band_off:band_off + nband], oh,
                       preferred_element_type=f32)
        # level source: level l takes pfrac of layer min(l, nlay-1); the
        # bottom level of layer l is level l+1 -> pfrac[min(l+1, nlay-1)]
        # (see compute_planck_source_nn)
        lev = pf_scr[pf_lev_idx] * levb
        src = (1.0 - trans) * lev + 2.0 * fact * (lay - lev)
        return trans * rad + src

    # ---- phase B: top-down sweep ---------------------------------------
    def down(l, rad):
        rad = transport(l, rad, o_bot, jnp.minimum(l + 1, nlay - 1))
        dn_acc[pl.ds(l + 1, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    rad = jnp.zeros_like(tau_scr[0])
    dn_acc[pl.ds(0, 1), :] = jnp.zeros_like(rad[:, 0])[None, :]
    rad = jax.lax.fori_loop(0, nlay, down, rad)

    # ---- phase C: surface + bottom-up sweep ----------------------------
    sfc_source = pf_scr[nlay - 1] * jnp.dot(
        pls_ref[:, :], oh, preferred_element_type=f32)
    emis = emis_ref[:, :]
    rad = rad * (1.0 - emis) + emis * sfc_source
    up_acc[pl.ds(nlay, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]

    def up(i, rad):
        l = nlay - 1 - i
        rad = transport(l, rad, o_top, l)
        up_acc[pl.ds(l, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    jax.lax.fori_loop(0, nlay, up, rad)

    dn_ref[:, :] = jnp.transpose(dn_acc[:, :], (1, 0))
    up_ref[:, :] = jnp.transpose(up_acc[:, :], (1, 0))


def _phase_a_sources(nlay, ngpt, nband, nf, tile_c, d_secant, tau_thresh,
                     fused_ref, pls_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                     omean_ref, ostd_ref, oh_ref):
    """Shared phase A: batched MLP + transmittance + g-point Planck sources
    from a lane-packed (nlay, tile_c, [x | col_dry | B_lay | B_lev_top |
    B_lev_bot]) block, with HOST-interpolated band Planck values (bit-exact
    vs the staged XLA path; an in-kernel banded-matmul totplnk interp was
    measured ~2e-3 relative off -- see lw_clearsky_mega2's fate in
    docs/PERFORMANCE.md). Returns flat (nlay*tile_c, ngpt) trans/src_dn/
    src_up and the (tile_c, ngpt) surface source."""
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
    tl_safe = jnp.where(tl > tau_thresh, tl, 1.0)
    fact = jnp.where(
        tl > tau_thresh,
        (1.0 - trans) / tl_safe - trans,
        tl * (0.5 - (1.0 / 3.0) * tl),
    )
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


def lw_clearsky_megakernel(
    model,
    nn_inputs,        # (nlay, ncol, nf) scaled features, layer-major
    col_dry,          # (nlay, ncol)
    planck_lay_band,  # (nlay, ncol, nband)
    planck_lev_band,  # (nlay+1, ncol, nband)
    planck_sfc_band,  # (ncol, nband)
    one_hot,          # (nband, ngpt) band->gpt expansion
    sfc_emis,         # (ncol, ngpt)
    d_secant: float = 1.66,
    weight: float = 0.5,
    tile_c: int = 64,
    interpret: bool | None = None,
):
    """Broadband LW fluxes (flux_up, flux_dn), each (ncol, nlay+1), from
    scaled layer-major NN inputs in one fused kernel. Canonical top-at-0,
    single angle, zero incident flux; float32; 3-layer softsign 'lw_both'
    model."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nlay, ncol, nf = nn_inputs.shape
    nband, ngpt = one_hot.shape
    f32 = jnp.float32

    # one lane-packed per-layer input: [x | col_dry | B_lay | B_top | B_bot]
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
        sfc_emis = jnp.pad(sfc_emis, ((0, cpad), (0, 0)))
    n = fused.shape[1]
    grid = (n // tile_c,)

    w1, w2, w3 = model.weights
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
        _mega_kernel, nlay, ngpt, nband, nf, d_secant, two_pi_w, tau_thresh
    )
    up, dn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nlay, tile_c, nfu), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            col2(nband), col2(ngpt),
            rep(w1.shape), rep((1, b1.shape[0])),
            rep(w2.shape), rep((1, b2.shape[0])),
            rep(w3.shape), rep((1, b3.shape[0])),
            rep((1, model.output_mean.shape[0])),
            rep((1, model.output_std.shape[0])),
            rep(one_hot.shape),
        ],
        out_specs=(out_bs, out_bs),
        out_shape=(
            jax.ShapeDtypeStruct((n, nlay + 1), f32),
            jax.ShapeDtypeStruct((n, nlay + 1), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay, tile_c, ngpt), f32),
            pltpu.VMEM((nlay + 1, tile_c), f32),
            pltpu.VMEM((nlay + 1, tile_c), f32),
        ],
        interpret=interpret,
    )(
        fused,
        planck_sfc_band.astype(f32), sfc_emis.astype(f32),
        w1.astype(f32), row2(b1), w2.astype(f32), row2(b2),
        w3.astype(f32), row2(b3),
        row2(model.output_mean), row2(model.output_std),
        one_hot.astype(f32),
    )
    return up[:ncol], dn[:ncol]


def _mega2_kernel(nlay, ngpt, nband, nf, ntab, tile_c, d_secant, two_pi_w,
                  tau_thresh, t_min, t_delta,
                  ff_ref, tsfc_ref, emis_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  omean_ref, ostd_ref, oh_ref, tphi_ref, tplo_ref,
                  up_ref, dn_ref,
                  trans_scr, sdn_scr, sup_scr, dn_acc, up_acc):
    f32 = jnp.float32
    rows = nlay * tile_c
    o_cd = nf          # fused lanes: [x | col_dry | tlay | tlev_top | tlev_bot]
    o_tlay = nf + 1
    o_top = nf + 2
    o_bot = nf + 3

    tphi = tphi_ref[:, :]          # (ntab, 2*nband) [tp_hi | dtp_hi]
    tplo = tplo_ref[:, :]          # (ntab, 2*nband) [tp_lo | dtp_lo]
    oh = oh_ref[:, :]              # (nband, ngpt)

    def planck_interp(t_col):
        # linear interpolation as exact one-hot row-pick matmuls (MXU
        # gathers are poison in Mosaic, row-picks are not): the combined
        # [table | forward-difference] row at i0 in one (hi + lo) matmul
        # pair -- the hi/lo bf16 split survives the MXU's bf16 input
        # truncation losslessly, so the lerp below reproduces
        # PlanckTable.interpolate's f32 arithmetic to ~1 ulp (a plain f32
        # matmul loses ~0.4% = ~2 W/m2 in flux; Precision.HIGHEST fails to
        # compile through Mosaic). Edge semantics must also match
        # reference interpolate1D exactly: index clamped, fraction =
        # val0 - trunc(val0) UNclamped -- RFMIP TOA levels sit below the
        # 160 K table floor, where a clamped fraction diverges by
        # ~0.4 W/m2.
        val0 = (t_col - t_min) / t_delta            # (rows', 1)
        tr = jnp.trunc(val0)
        i0 = jnp.clip(tr, 0.0, float(ntab - 2))
        frac = val0 - tr
        k = jax.lax.broadcasted_iota(
            jnp.int32, (t_col.shape[0], ntab), 1).astype(f32)
        oh0 = (k == i0).astype(f32)                 # exact 0/1
        g = (jnp.dot(oh0, tphi, preferred_element_type=f32)
             + jnp.dot(oh0, tplo, preferred_element_type=f32))
        return g[:, :nband] + frac * g[:, nband:]

    # ---- phase A (batched over all rows): MLP + sources -> scratch ------
    ff = ff_ref[:, :, :].reshape(rows, ff_ref.shape[-1])
    x = ff[:, :nf]
    h = _softsign(jnp.dot(x, w1_ref[:, :], preferred_element_type=f32)
                  + b1_ref[0, :])
    h = _softsign(jnp.dot(h, w2_ref[:, :], preferred_element_type=f32)
                  + b2_ref[0, :])
    y = jnp.dot(h, w3_ref[:, :], preferred_element_type=f32) + b3_ref[0, :]
    yt = ostd_ref[0, :ngpt] * y[:, :ngpt] + omean_ref[0, :ngpt]
    y2 = yt * yt
    y4 = y2 * y2
    tl = (y4 * y4) * ff[:, o_cd:o_cd + 1] * d_secant
    pf = y[:, ngpt:2 * ngpt]
    pf = pf * pf

    trans = jnp.exp(-tl)
    tl_safe = jnp.where(tl > tau_thresh, tl, 1.0)
    fact = jnp.where(
        tl > tau_thresh,
        (1.0 - trans) / tl_safe - trans,
        tl * (0.5 - (1.0 / 3.0) * tl),
    )
    lay = pf * jnp.dot(planck_interp(ff[:, o_tlay:o_tlay + 1]), oh,
                       preferred_element_type=f32)
    lev_t = pf * jnp.dot(planck_interp(ff[:, o_top:o_top + 1]), oh,
                         preferred_element_type=f32)
    # pfrac of the layer below; bottom layer reuses its own (see
    # compute_planck_source_nn / lw_prep_pallas)
    pf_next = pltpu.roll(pf, rows - tile_c, axis=0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    pf_next = jnp.where(ridx >= (nlay - 1) * tile_c, pf, pf_next)
    lev_b = pf_next * jnp.dot(planck_interp(ff[:, o_bot:o_bot + 1]), oh,
                              preferred_element_type=f32)
    one_m_t = 1.0 - trans
    two_fact = 2.0 * fact
    trans_scr[:, :, :] = trans.reshape(nlay, tile_c, ngpt)
    sdn_scr[:, :, :] = (one_m_t * lev_b + two_fact * (lay - lev_b)).reshape(
        nlay, tile_c, ngpt)
    sup_scr[:, :, :] = (one_m_t * lev_t + two_fact * (lay - lev_t)).reshape(
        nlay, tile_c, ngpt)
    sfc_source = pf[(nlay - 1) * tile_c:, :] * jnp.dot(
        planck_interp(tsfc_ref[:, :]), oh, preferred_element_type=f32)

    # ---- phase B: top-down sweep (VPU, VMEM-resident) -------------------
    def down(l, rad):
        rad = trans_scr[l] * rad + sdn_scr[l]
        dn_acc[pl.ds(l + 1, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    rad = jnp.zeros((tile_c, ngpt), f32)
    dn_acc[pl.ds(0, 1), :] = jnp.zeros((1, tile_c), f32)
    rad = jax.lax.fori_loop(0, nlay, down, rad)

    # ---- phase C: surface + bottom-up sweep ------------------------------
    emis = emis_ref[:, :]
    rad = rad * (1.0 - emis) + emis * sfc_source
    up_acc[pl.ds(nlay, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]

    def up(i, rad):
        l = nlay - 1 - i
        rad = trans_scr[l] * rad + sup_scr[l]
        up_acc[pl.ds(l, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    jax.lax.fori_loop(0, nlay, up, rad)

    dn_ref[:, :] = jnp.transpose(dn_acc[:, :], (1, 0))
    up_ref[:, :] = jnp.transpose(up_acc[:, :], (1, 0))


def lw_clearsky_mega2(
    model,
    nn_inputs,        # (nlay, ncol, nf) scaled features, layer-major
    col_dry,          # (nlay, ncol)
    tlay,             # (nlay, ncol)
    tlev,             # (nlay+1, ncol)
    tsfc,             # (ncol,)
    planck_table,     # gasoptics.planck.PlanckTable
    one_hot,          # (nband, ngpt)
    sfc_emis,         # (ncol, ngpt)
    d_secant: float = 1.66,
    weight: float = 0.5,
    tile_c: int = 32,
    interpret: bool | None = None,
):
    """Fully fused LW clear-sky pipeline, v2: scaled features + raw
    temperatures in, broadband (ncol, nlay+1) fluxes out, ONE Pallas kernel.

    v2 over lw_clearsky_megakernel: (a) the MLP runs as full-height
    (nlay*tile) GEMMs instead of a per-layer loop (the loop starved the
    MXU); (b) the totplnk interpolation happens in-kernel as a banded-
    weight matmul, so the band Planck fields -- previously 48 of the 56
    fused input lanes and the bulk of the staging concatenate -- never
    exist anywhere; (c) transmittance/sources build in one batched pass
    into VMEM scratch and the two sweeps consume them as pure VPU
    mul-adds. HBM traffic per call is just the 2-D inputs and the
    (ncol, nlay+1) outputs: ~4 MB per 1800 columns vs ~1.5 GB staged.

    Physics identical to predict_nn_lw + compute_planck_source_nn +
    lw_solver_noscat broadband (reference mo_gas_optics_kernels.F90:690-862,
    615-683; mo_rte_solver_kernels.F90:119-330). Single angle, zero
    incident flux, f32, 3-layer softsign 'lw_both' model.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nlay, ncol, nf = nn_inputs.shape
    nband, ngpt = one_hot.shape
    f32 = jnp.float32
    tp = jnp.asarray(planck_table.totplnk, f32)
    ntab = tp.shape[0]
    # combined [table | forward-difference] with hi/lo bf16 split (see
    # planck_interp in the kernel); dtp zero-padded to ntab rows (row
    # ntab-1 is never picked: i0 <= ntab-2)
    dtp = jnp.concatenate([tp[1:] - tp[:-1], jnp.zeros((1, nband), f32)], 0)
    cat = jnp.concatenate([tp, dtp], axis=1)          # (ntab, 2*nband)
    cat_hi = cat.astype(jnp.bfloat16).astype(f32)
    cat_lo = cat - cat_hi

    # one lane-packed per-layer input: [x | col_dry | tlay | tlev_t | tlev_b]
    fused = jnp.concatenate(
        [
            nn_inputs.astype(f32),
            col_dry.astype(f32)[..., None],
            tlay.astype(f32)[..., None],
            tlev[:-1].astype(f32)[..., None],
            tlev[1:].astype(f32)[..., None],
        ],
        axis=-1,
    )
    nfu = fused.shape[-1]
    tsfc2 = tsfc.astype(f32)[:, None]

    cpad = (-ncol) % tile_c
    if cpad:
        fused = jnp.pad(fused, ((0, 0), (0, cpad), (0, 0)))
        tsfc2 = jnp.pad(tsfc2, ((0, cpad), (0, 0)))
        sfc_emis = jnp.pad(sfc_emis, ((0, cpad), (0, 0)))
    n = fused.shape[1]
    grid = (n // tile_c,)

    w1, w2, w3 = model.weights
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
        _mega2_kernel, nlay, ngpt, nband, nf, ntab, tile_c, d_secant,
        two_pi_w, tau_thresh,
        float(planck_table.temp_ref_min), float(planck_table.totplnk_delta),
    )
    up, dn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nlay, tile_c, nfu), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            col2(1), col2(ngpt),
            rep(w1.shape), rep((1, b1.shape[0])),
            rep(w2.shape), rep((1, b2.shape[0])),
            rep(w3.shape), rep((1, b3.shape[0])),
            rep((1, model.output_mean.shape[0])),
            rep((1, model.output_std.shape[0])),
            rep(one_hot.shape),
            rep((ntab, 2 * nband)),
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
        interpret=interpret,
    )(
        fused, tsfc2, sfc_emis.astype(f32),
        w1.astype(f32), row2(b1), w2.astype(f32), row2(b2),
        w3.astype(f32), row2(b3),
        row2(model.output_mean), row2(model.output_std),
        one_hot.astype(f32), cat_hi, cat_lo,
    )
    return up[:ncol], dn[:ncol]


def _mega3_kernel(nlay, ngpt, nband, nf, tile_c, d_secant, two_pi_w,
                  tau_thresh,
                  fused_ref, pls_ref, emis_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  omean_ref, ostd_ref, oh_ref,
                  up_ref, dn_ref,
                  trans_scr, sdn_scr, sup_scr, dn_acc, up_acc):
    f32 = jnp.float32

    # ---- phase A (batched over all rows): MLP + sources -> scratch ------
    trans, src_dn, src_up, sfc_source = _phase_a_sources(
        nlay, ngpt, nband, nf, tile_c, d_secant, tau_thresh,
        fused_ref, pls_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
        omean_ref, ostd_ref, oh_ref)
    trans_scr[:, :, :] = trans.reshape(nlay, tile_c, ngpt)
    sdn_scr[:, :, :] = src_dn.reshape(nlay, tile_c, ngpt)
    sup_scr[:, :, :] = src_up.reshape(nlay, tile_c, ngpt)

    # ---- phase B: top-down sweep (VPU, VMEM-resident) -------------------
    def down(l, rad):
        rad = trans_scr[l] * rad + sdn_scr[l]
        dn_acc[pl.ds(l + 1, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    rad = jnp.zeros((tile_c, ngpt), f32)
    dn_acc[pl.ds(0, 1), :] = jnp.zeros((1, tile_c), f32)
    rad = jax.lax.fori_loop(0, nlay, down, rad)

    # ---- phase C: surface + bottom-up sweep ------------------------------
    emis = emis_ref[:, :]
    rad = rad * (1.0 - emis) + emis * sfc_source
    up_acc[pl.ds(nlay, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]

    def up(i, rad):
        l = nlay - 1 - i
        rad = trans_scr[l] * rad + sup_scr[l]
        up_acc[pl.ds(l, 1), :] = (jnp.sum(rad, axis=1) * two_pi_w)[None, :]
        return rad

    jax.lax.fori_loop(0, nlay, up, rad)

    dn_ref[:, :] = jnp.transpose(dn_acc[:, :], (1, 0))
    up_ref[:, :] = jnp.transpose(up_acc[:, :], (1, 0))


def lw_clearsky_mega3(
    model,
    nn_inputs,        # (nlay, ncol, nf) scaled features, layer-major
    col_dry,          # (nlay, ncol)
    planck_lay_band,  # (nlay, ncol, nband)
    planck_lev_band,  # (nlay+1, ncol, nband)
    planck_sfc_band,  # (ncol, nband)
    one_hot,          # (nband, ngpt)
    sfc_emis,         # (ncol, ngpt)
    d_secant: float = 1.66,
    weight: float = 0.5,
    tile_c: int = 32,
    interpret: bool | None = None,
):
    """Fully fused LW clear-sky pipeline, v3: lw_prep_pallas's bit-exact
    phase A (host-interpolated band Planck lanes) + mega2's VMEM-resident
    broadband sweeps. ONE Pallas kernel from packed features to broadband
    (ncol, nlay+1) fluxes; tau/pfrac/sources never reach HBM.

    v3 over mega2: the in-kernel banded-matmul totplnk interpolation is
    dropped -- its bf16 hi/lo split still lost ~2e-3 relative on the MXU
    (0.39 W/m2 in flux_dn), while the band Planck lanes it saved are only
    ~19 MB of the ~1.5 GB staged traffic (~0.04 ms at HBM speed). Host
    interpolation restores bit-exact parity with the staged path at
    negligible bandwidth cost.

    Physics identical to predict_nn_lw + compute_planck_source_nn +
    lw_solver_noscat broadband (reference mo_gas_optics_kernels.F90:690-862,
    615-683; mo_rte_solver_kernels.F90:119-330). Single angle, zero
    incident flux, f32, 3-layer softsign 'lw_both' model.
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
        sfc_emis = jnp.pad(sfc_emis, ((0, cpad), (0, 0)))
    n = fused.shape[1]
    grid = (n // tile_c,)

    w1, w2, w3 = model.weights
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
        _mega3_kernel, nlay, ngpt, nband, nf, tile_c, d_secant,
        two_pi_w, tau_thresh,
    )
    up, dn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nlay, tile_c, nfu), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            col2(nband), col2(ngpt),
            rep(w1.shape), rep((1, b1.shape[0])),
            rep(w2.shape), rep((1, b2.shape[0])),
            rep(w3.shape), rep((1, b3.shape[0])),
            rep((1, model.output_mean.shape[0])),
            rep((1, model.output_std.shape[0])),
            rep(one_hot.shape),
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
        interpret=interpret,
    )(
        fused, planck_sfc_band.astype(f32), sfc_emis.astype(f32),
        w1.astype(f32), row2(b1), w2.astype(f32), row2(b2),
        w3.astype(f32), row2(b3),
        row2(model.output_mean), row2(model.output_std),
        one_hot.astype(f32),
    )
    return up[:ncol], dn[:ncol]
