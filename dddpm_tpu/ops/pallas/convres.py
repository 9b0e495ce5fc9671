"""Fully fused ConvResBlock bottleneck: mish -> 1x1 -> mish -> 3x3 ->
mish -> 3x3 -> mish -> 1x1 (+ residual), forward AND backward as Pallas
kernels, in a lane-packed layout.

Why: the dDDPM x3 256^2 train step is dominated by resampler
ConvResBlocks (reference models/downsampled/convblocks.py:92-130), and
their C=32/64 channels fill only 32/128 MXU lanes in the natural NHWC
im2col GEMM — XLA's conv path runs at ~5 TF effective on a v5e chip
(scripts/probe_resampler.py) because every GEMM pads N=32->128 and
every vector op wastes 3/4 of the VPU lanes.

The fix is a layout, not a schedule: view NHWC (H, W, C) as
(H, W/4, 4C).  This is a FREE contiguous reshape (the last two dims
merge in memory order), and it makes the lane dim 4C = 128/256 exactly:

- every elementwise op (mish, masks, casts) runs at full VPU width;
- the 1x1 convs become block-diagonal GEMMs kron(I4, w) with K and N
  both multiples of 128 — 2x fewer padded FLOPs than the NHWC form;
- each 3x3 conv becomes NINE accumulating (M,128)x(128,128) GEMMs
  whose left operands are *constant-row-offset slices* of the
  flattened activation (out-of-block kx taps reach the previous/next
  W-block, i.e. row offset +-1 in the (row*W/4 + wj) flattening), and
  whose weights are host-built 128x128 blocks of a tap-packed W_eff.
  No im2col tensor, no lane shifts, no Mosaic relayout assembly: the
  W-shift structure folds entirely into W_eff's sparsity pattern.

Forward reads x once and writes y once; backward reads x + dy and
writes dx, recomputing the forward intermediates in VMEM flash-style.
Weight gradients accumulate across the sequential grid in resident
f32 VMEM blocks (constant index_map) in the SAME packed W_eff shapes;
the (ky, kx, ci, co) gradients are extracted outside the kernel by
summing each logical weight's four packed replicas.

Grid: (B, H/TILE_H), sequential on TPU.  Row tiles carry a 2-row
(forward) / 4-row (backward) image-row halo, DMA'd from a row- and
lane-padded copy of the input (manual HBM DMA slices must be
128-lane aligned).  Out-of-image halo rows and out-of-row W-border
taps are masked where conv SAME zero padding is semantic.

Equivalence and gradient tests vs the pure-JAX reference:
tests/test_convres_kernel.py (interpreter mode on CPU).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK = 4  # W-positions folded into the lane dim
# image-row tile height (probe-tunable): 16 measured best at 256^2
TH = 16


def _mish(x):
    """Mish in f32 (matches ops.math.mish up to compute precision)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def _dmish(x):
    """mish'(x) = t + x * s * (1 - t^2), t = tanh(softplus(x))."""
    t = jnp.tanh(jax.nn.softplus(x))
    s = jax.nn.sigmoid(x)
    return t + x * s * (1.0 - t * t)


# ----------------------------------------------------- packed weights


def _pack_1x1(w):
    """(ci, co) -> block-diagonal (PACK*ci, PACK*co) = kron(I4, w)."""
    ci, co = w.shape
    eye = jnp.eye(PACK, dtype=w.dtype)
    return jnp.kron(eye, w)


def _tap_index(kx, wi):
    """W-tap (kx, output lane-pos wi) -> (wjoff block offset, wi')."""
    wpos = wi + kx - 1
    return wpos // PACK, wpos % PACK


def _pack_3x3(w):
    """HWIO (3, 3, ci, co) -> W_eff (9*PACK*ci, PACK*co).

    Row t*PACK*ci + wi'*ci + i, column wi*co + o holds w[ky, kx, i, o]
    for the unique (wjoff, wi') = _tap_index(kx, wi), t = ky*3+wjoff+1.
    Each logical weight appears PACK times (once per output lane-pos).
    """
    _, _, ci, co = w.shape
    weff = jnp.zeros((9 * PACK * ci, PACK * co), w.dtype)
    for ky in range(3):
        for kx in range(3):
            for wi in range(PACK):
                wjoff, wip = _tap_index(kx, wi)
                t = ky * 3 + (wjoff + 1)
                r0 = t * PACK * ci + wip * ci
                c0 = wi * co
                weff = weff.at[r0:r0 + ci, c0:c0 + co].set(w[ky, kx])
    return weff


def _unpack_dw_3x3(dweff, ci, co, dtype):
    """Sum the PACK replicas of each logical 3x3 weight gradient."""
    dw = jnp.zeros((3, 3, ci, co), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            acc = jnp.zeros((ci, co), jnp.float32)
            for wi in range(PACK):
                wjoff, wip = _tap_index(kx, wi)
                t = ky * 3 + (wjoff + 1)
                r0 = t * PACK * ci + wip * ci
                c0 = wi * co
                acc = acc + dweff[r0:r0 + ci, c0:c0 + co]
            dw = dw.at[ky, kx].set(acc)
    return dw.astype(dtype)


def _unpack_dw_1x1(dweff, ci, co, dtype):
    """Sum the PACK diagonal blocks of a block-diag weight gradient."""
    acc = jnp.zeros((ci, co), jnp.float32)
    for wi in range(PACK):
        acc = acc + dweff[wi * ci:(wi + 1) * ci, wi * co:(wi + 1) * co]
    return acc.astype(dtype)


def _unpack_db(dbeff, c, dtype):
    return jnp.sum(dbeff.reshape(PACK, c), axis=0).astype(dtype)


def _flip_hwio(w):
    """HWIO kernel -> spatially flipped, ci<->co swapped (the dgrad
    kernel): conv^T(g, w) == conv(g, flip(w))."""
    return w[::-1, ::-1].transpose(0, 1, 3, 2)


# ----------------------------------------------------- in-kernel math


def _row_mask(rows, start_img_row, h, nb, dtype, width):
    """(rows, width) mask over flat (img_row * nb + wj) rows: 1 where
    the image row is inside [0, h).  Full lane width: Mosaic cannot
    relayout (rows, 1) i1 vectors into packed-dtype broadcasts."""
    gr = (lax.broadcasted_iota(jnp.int32, (rows, width), 0) // nb
          + start_img_row)
    # predicate+select in f32 (the iota's tiling), cast after: Mosaic
    # cannot relayout i1 vectors into the packed bf16 tiling
    m = jnp.where((gr >= 0) & (gr < h), 1.0, 0.0)
    return m.astype(dtype)


def _wj_masks(rows, nb, dtype, width):
    """Border masks for the wjoff = -1 / +1 pieces: zero where the
    neighbouring W-block falls outside the row."""
    wj = lax.broadcasted_iota(jnp.int32, (rows, width), 0) % nb
    return (jnp.where(wj > 0, 1.0, 0.0).astype(dtype),      # wjoff = -1
            jnp.where(wj < nb - 1, 1.0, 0.0).astype(dtype))  # wjoff = +1


def _conv_packed(mflat, weff_ref, nb, out_rows, start, masks, bias=None):
    """One packed 3x3 conv: nine accumulating GEMMs over constant-
    row-offset slices of `mflat` (a clean (rows, L) value).

    mflat rows are (img_row * nb + wj); the output frame starts
    `start` flat rows into the input frame (start = nb for the
    standard valid-in-H conv whose first output row needs input rows
    0..2).  masks = (mask_m1, mask_p1) from _wj_masks for out_rows.
    """
    mask_m1, mask_p1 = masks
    lin = weff_ref.shape[0] // 9
    mp = jnp.pad(mflat, ((1, 1), (0, 0)))
    acc = None
    for t in range(9):
        ky, wjoff = t // 3, t % 3 - 1
        off = (ky - 1) * nb + wjoff + start
        piece = mp[1 + off:1 + off + out_rows]
        if wjoff == -1:
            piece = piece * mask_m1
        elif wjoff == 1:
            piece = piece * mask_p1
        d = jnp.dot(piece, weff_ref[t * lin:(t + 1) * lin, :],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc if bias is None else acc + bias


def _wgrad_packed(dweff_ref, mflat, gc, nb, cstart, masks_c):
    """Accumulate the packed 3x3 weight gradient: for each tap t,
    dWeff[t] += piece_t(mflat, central frame)^T @ gc."""
    mask_m1, mask_p1 = masks_c
    rows_c = gc.shape[0]
    lin = dweff_ref.shape[0] // 9
    cdims = (((0,), (0,)), ((), ()))
    mp = jnp.pad(mflat, ((1, 1), (0, 0)))
    for t in range(9):
        ky, wjoff = t // 3, t % 3 - 1
        off = (ky - 1) * nb + wjoff + cstart
        piece = mp[1 + off:1 + off + rows_c]
        if wjoff == -1:
            piece = piece * mask_m1
        elif wjoff == 1:
            piece = piece * mask_p1
        dweff_ref[t * lin:(t + 1) * lin, :] += lax.dot_general(
            piece, gc, cdims, preferred_element_type=jnp.float32)


# --------------------------------------------------------------- forward


def _pool_matrices(cio, dtype):
    """Lane-remap selection matrices for the in-kernel 2x2 mean pool.

    Pe maps input block lanes (wi, c) to pooled lanes (wi//2, c) — the
    contribution of an EVEN W-block (out positions 0,1); Po maps to
    (2 + wi//2, c) — an ODD block (out positions 2,3).  Entries 0.25 =
    the pool mean folded in (the H-pair sum supplies the other factor
    of 2)."""
    import numpy as _np
    ci4 = PACK * cio
    pe = _np.zeros((ci4, ci4), _np.float32)
    po = _np.zeros((ci4, ci4), _np.float32)
    eye = 0.25 * _np.eye(cio, dtype=_np.float32)
    for wi in range(PACK):
        s, do = wi * cio, (wi // 2) * cio
        pe[s:s + cio, do:do + cio] = eye
        po[s:s + cio, 2 * cio + do:3 * cio + do] = eye
    return jnp.asarray(pe, dtype), jnp.asarray(po, dtype)


def _upsample_matrices(cio, dtype):
    """Lane-expand matrices for the in-kernel 2x nearest upsample:
    E0 produces the EVEN output block (out position wi' <- in wi'//2),
    E1 the ODD output block (out wi' <- in 2 + wi'//2)."""
    import numpy as _np
    ci4 = PACK * cio
    e0 = _np.zeros((ci4, ci4), _np.float32)
    e1 = _np.zeros((ci4, ci4), _np.float32)
    eye = _np.eye(cio, dtype=_np.float32)
    for wo in range(PACK):
        d, s0, s1 = wo * cio, (wo // 2) * cio, (2 + wo // 2) * cio
        e0[s0:s0 + cio, d:d + cio] = eye
        e1[s1:s1 + cio, d:d + cio] = eye
    return jnp.asarray(e0, dtype), jnp.asarray(e1, dtype)


def _fwd_kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                w4_ref, b4_ref, sa_ref, sb_ref, y_ref, xt, sem, *, th, h,
                nb, ci4, residual, scale):
    b = pl.program_id(0)
    j = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_ref.at[pl.ds(b, 1), pl.ds(j * th, th + 4)], xt, sem)
    dma.start()
    dma.wait()

    # (th+4, nb, lane-padded 4*cio) -> true packed width ci4
    x4 = xt[0][:, :, :ci4]
    rows1 = (th + 4) * nb
    dt = x4.dtype

    m0 = _mish(x4.astype(jnp.float32)).astype(dt)
    flat0 = m0.reshape(rows1, ci4)
    p1 = (jnp.dot(flat0, w1_ref[:], preferred_element_type=jnp.float32)
          + b1_ref[:])
    # conv SAME pads with TRUE zeros outside the image; halo rows that
    # fall outside must be zeroed (mish(b1) != 0 there otherwise)
    cm4 = w1_ref.shape[-1]
    m1 = (_mish(p1).astype(dt)
          * _row_mask(rows1, j * th - 2, h, nb, dt, cm4))

    rows2 = (th + 2) * nb
    masks2 = _wj_masks(rows2, nb, dt, cm4)
    p2 = _conv_packed(m1, w2_ref, nb, rows2, nb, masks2, b2_ref[:])
    m2 = (_mish(p2).astype(dt)
          * _row_mask(rows2, j * th - 1, h, nb, dt, cm4))

    rows3 = th * nb
    masks3 = _wj_masks(rows3, nb, dt, cm4)
    p3 = _conv_packed(m2, w3_ref, nb, rows3, nb, masks3, b3_ref[:])
    m3 = _mish(p3).astype(dt)

    p4 = (jnp.dot(m3, w4_ref[:], preferred_element_type=jnp.float32)
          + b4_ref[:])
    if residual:
        p4 = p4 + flatc(x4, 2 * nb, rows3).astype(jnp.float32)

    if scale == "down":
        # 2x2 mean pool in the packed layout: H pairs are contiguous
        # nb-row groups of the flat value (a cheap sublane slice+add);
        # W pairs are a lane remap done as two selection GEMMs whose
        # outputs land in disjoint lane ranges, gathered by block parity
        v = p4.reshape(th // 2, 2 * nb, ci4)
        hsum = (v[:, :nb, :] + v[:, nb:, :]).astype(dt)
        qe = jnp.dot(hsum.reshape((th // 2) * nb, ci4), sa_ref[:],
                     preferred_element_type=jnp.float32)
        qo = jnp.dot(hsum.reshape((th // 2) * nb, ci4), sb_ref[:],
                     preferred_element_type=jnp.float32)
        qe4 = qe.reshape(th // 2, nb // 2, 2, ci4)
        qo4 = qo.reshape(th // 2, nb // 2, 2, ci4)
        y_ref[0] = (qe4[:, :, 0] + qo4[:, :, 1]).astype(y_ref.dtype)
    elif scale == "up":
        # 2x nearest upsample: lane expand via two selection GEMMs
        # (even / odd output blocks), interleave blocks, duplicate rows
        vdt = p4.astype(dt)
        ue = jnp.dot(vdt, sa_ref[:], preferred_element_type=jnp.float32)
        uo = jnp.dot(vdt, sb_ref[:], preferred_element_type=jnp.float32)
        z = jnp.concatenate(
            [ue.reshape(th, nb, 1, ci4), uo.reshape(th, nb, 1, ci4)],
            axis=2).reshape(th, 2 * nb, ci4)
        z2 = jnp.broadcast_to(z[:, None], (th, 2, 2 * nb, ci4))
        y_ref[0] = z2.reshape(2 * th, 2 * nb, ci4).astype(y_ref.dtype)
    else:
        y_ref[0] = p4.reshape(th, nb, ci4).astype(y_ref.dtype)


def flatc(x3, start, rows):
    """Central flat-row slice of a (R, nb, L) packed value."""
    r, nb, L = x3.shape
    return x3.reshape(r * nb, L)[start:start + rows]


def _fused_forward(x, w1, b1, w2, b2, w3, b3, w4, b4, residual,
                   interpret=False, scale=None):
    interpret = interpret or jax.default_backend() == "cpu"
    bsz, h, w, cio = x.shape
    cm = w1.shape[-1]
    assert w % PACK == 0, (w, PACK)
    nb = w // PACK
    ci4, cm4 = PACK * cio, PACK * cm
    th = min(TH, h)
    assert h % th == 0, (h, th)
    if scale == "down":
        assert th % 2 == 0 and nb % 2 == 0, (th, nb)
        out_block = (1, th // 2, nb // 2, ci4)
        out_shape = (bsz, h // 2, nb // 2, ci4)
        out_hw = (h // 2, w // 2)
    elif scale == "up":
        out_block = (1, 2 * th, 2 * nb, ci4)
        out_shape = (bsz, 2 * h, 2 * nb, ci4)
        out_hw = (2 * h, 2 * w)
    else:
        out_block = (1, th, nb, ci4)
        out_shape = (bsz, h, nb, ci4)
        out_hw = (h, w)
    # lane-remap selection matrices for the in-kernel scaling GEMMs
    # (pallas kernels cannot capture array constants); (1,1) dummies
    # keep the kernel arity uniform when scale is None
    if scale == "down":
        smat_a, smat_b = _pool_matrices(cio, x.dtype)
    elif scale == "up":
        smat_a, smat_b = _upsample_matrices(cio, x.dtype)
    else:
        smat_a = smat_b = jnp.zeros((1, 1), x.dtype)

    # free contiguous view NHWC -> (H, W/4, 4C); manual HBM DMA slices
    # must be 128-lane aligned, so pad the packed lane dim if needed
    # (the physical HBM layout is 128-lane padded either way)
    cl = -(-ci4 // 128) * 128
    xp = jnp.pad(x.reshape(bsz, h, nb, ci4),
                 ((0, 0), (2, 2), (0, 0), (0, cl - ci4)))
    dt = x.dtype

    vec = lambda d: pl.BlockSpec((1, d), lambda b, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda b, j: (0, 0),
                                    memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        partial(_fwd_kernel, th=th, h=h, nb=nb, ci4=ci4,
                residual=residual, scale=scale),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xp, DMA'd manually
            mat(ci4, cm4), vec(cm4), mat(9 * cm4, cm4), vec(cm4),
            mat(9 * cm4, cm4), vec(cm4), mat(cm4, ci4), vec(ci4),
            mat(*smat_a.shape), mat(*smat_b.shape),
        ],
        out_specs=pl.BlockSpec(out_block, lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, th + 4, nb, cl), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp,
      _pack_1x1(w1.reshape(cio, cm)).astype(dt),
      jnp.tile(b1, PACK).reshape(1, cm4).astype(jnp.float32),
      _pack_3x3(w2).astype(dt),
      jnp.tile(b2, PACK).reshape(1, cm4).astype(jnp.float32),
      _pack_3x3(w3).astype(dt),
      jnp.tile(b3, PACK).reshape(1, cm4).astype(jnp.float32),
      _pack_1x1(w4.reshape(cm, cio)).astype(dt),
      jnp.tile(b4, PACK).reshape(1, ci4).astype(jnp.float32),
      smat_a, smat_b)
    return y.reshape(bsz, *out_hw, cio)


# -------------------------------------------------------------- backward


def _bwd_kernel(xp_ref, dyp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, b3_ref, w1t_ref, w2f_ref, w3f_ref, w4t_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dw3_ref, db3_ref, dw4_ref, db4_ref,
                xt, dyt, sem, *, th, h, nb, ci4, residual):
    b = pl.program_id(0)
    j = pl.program_id(1)

    dma_x = pltpu.make_async_copy(
        xp_ref.at[pl.ds(b, 1), pl.ds(j * th, th + 8)], xt, sem)
    dma_x.start()
    dma_x.wait()
    dma_dy = pltpu.make_async_copy(
        dyp_ref.at[pl.ds(b, 1), pl.ds(j * th, th + 4)], dyt, sem)
    dma_dy.start()
    dma_dy.wait()

    x4 = xt[0][:, :, :ci4]                      # (th+8, nb, ci4)
    dy4 = dyt[0][:, :, :ci4]                    # (th+4, nb, ci4)
    dt = x4.dtype

    @pl.when((b == 0) & (j == 0))
    def _():
        for ref in (dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dw3_ref, db3_ref, dw4_ref, db4_ref):
            ref[:] = jnp.zeros_like(ref)

    # ---- forward recompute, flash-style (rows shrink nb per 3x3)
    rows0 = (th + 8) * nb
    xf = x4.astype(jnp.float32).reshape(rows0, ci4)
    m0 = _mish(xf).astype(dt)
    p1 = (jnp.dot(m0, w1_ref[:], preferred_element_type=jnp.float32)
          + b1_ref[:])
    cm4 = w1_ref.shape[-1]
    m1 = (_mish(p1).astype(dt)
          * _row_mask(rows0, j * th - 4, h, nb, dt, cm4))

    rows_p2 = (th + 6) * nb
    masks_p2 = _wj_masks(rows_p2, nb, dt, cm4)
    p2 = _conv_packed(m1, w2_ref, nb, rows_p2, nb, masks_p2, b2_ref[:])
    m2 = (_mish(p2).astype(dt)
          * _row_mask(rows_p2, j * th - 3, h, nb, dt, cm4))

    rows_p3 = (th + 4) * nb
    masks_p3 = _wj_masks(rows_p3, nb, dt, cm4)
    p3 = _conv_packed(m2, w3_ref, nb, rows_p3, nb, masks_p3, b3_ref[:])
    m3 = _mish(p3).astype(dt)

    # ---- gradient chain (dy's zero halo rows make g3 vanish outside
    # the image; g2 gets an explicit mask)
    g4 = dy4.astype(jnp.float32).reshape(rows_p3, ci4)
    u3 = jnp.dot(g4.astype(dt), w4t_ref[:],
                 preferred_element_type=jnp.float32)
    g3 = (u3 * _dmish(p3)).astype(dt)           # (th+4)*nb

    rows_g2 = (th + 2) * nb
    masks_g2 = _wj_masks(rows_g2, nb, dt, cm4)
    u2 = _conv_packed(g3, w3f_ref, nb, rows_g2, nb, masks_g2)
    g2 = (u2 * _dmish(p2[2 * nb:(th + 4) * nb])).astype(dt)
    g2 = g2 * _row_mask(rows_g2, j * th - 1, h, nb, dt, cm4)

    rows_g1 = th * nb
    masks_g1 = _wj_masks(rows_g1, nb, dt, cm4)
    u1 = _conv_packed(g2, w2f_ref, nb, rows_g1, nb, masks_g1)
    g1 = (u1 * _dmish(p1[4 * nb:(th + 4) * nb])).astype(dt)
    u0 = jnp.dot(g1, w1t_ref[:], preferred_element_type=jnp.float32)
    dx = u0 * _dmish(xf[4 * nb:(th + 4) * nb])
    if residual:
        dx = dx + g4[2 * nb:(th + 2) * nb]
    dx_ref[0] = dx.reshape(th, nb, ci4).astype(dx_ref.dtype)

    # ---- parameter gradients over the tile's central rows only
    cdims = (((0,), (0,)), ((), ()))
    g4c = g4[2 * nb:(th + 2) * nb].astype(dt)
    m3c = m3[2 * nb:(th + 2) * nb]
    dw4_ref[:] += lax.dot_general(m3c, g4c, cdims,
                                  preferred_element_type=jnp.float32)
    db4_ref[:] += jnp.sum(g4c.astype(jnp.float32), axis=0, keepdims=True)

    g3c = g3[2 * nb:(th + 2) * nb]
    masks_c = _wj_masks(rows_g1, nb, dt, cm4)
    # m2's frame starts 1 image row (nb flat rows) before g3's frame;
    # g3c sits 2 rows into g3's frame -> central start = 3*nb rel. m2
    _wgrad_packed(dw3_ref, m2, g3c, nb, 3 * nb, masks_c)
    db3_ref[:] += jnp.sum(g3c.astype(jnp.float32), axis=0, keepdims=True)

    g2c = g2[nb:(th + 1) * nb]
    # m1's frame starts 4 image rows before the central rows
    _wgrad_packed(dw2_ref, m1, g2c, nb, 4 * nb, masks_c)
    db2_ref[:] += jnp.sum(g2c.astype(jnp.float32), axis=0, keepdims=True)

    g1c = g1
    m0c = m0[4 * nb:(th + 4) * nb]
    dw1_ref[:] += lax.dot_general(m0c, g1c, cdims,
                                  preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(g1c.astype(jnp.float32), axis=0, keepdims=True)


def _fused_backward(x, w1, b1, w2, b2, w3, b3, w4, b4, dy, residual,
                    interpret=False):
    interpret = interpret or jax.default_backend() == "cpu"
    bsz, h, w, cio = x.shape
    cm = w1.shape[-1]
    assert w % PACK == 0, (w, PACK)
    nb = w // PACK
    ci4, cm4 = PACK * cio, PACK * cm
    th = min(TH, h)

    cl = -(-ci4 // 128) * 128
    xp = jnp.pad(x.reshape(bsz, h, nb, ci4),
                 ((0, 0), (4, 4), (0, 0), (0, cl - ci4)))
    dyp = jnp.pad(dy.astype(x.dtype).reshape(bsz, h, nb, ci4),
                  ((0, 0), (2, 2), (0, 0), (0, cl - ci4)))
    dt = x.dtype

    vec = lambda d: pl.BlockSpec((1, d), lambda b, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda b, j: (0, 0),
                                    memory_space=pltpu.VMEM)

    w1p = _pack_1x1(w1.reshape(cio, cm))
    w4p = _pack_1x1(w4.reshape(cm, cio))

    outs = pl.pallas_call(
        partial(_bwd_kernel, th=th, h=h, nb=nb, ci4=ci4,
                residual=residual),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xp
            pl.BlockSpec(memory_space=pl.ANY),   # dyp
            mat(ci4, cm4), vec(cm4), mat(9 * cm4, cm4), vec(cm4),
            mat(9 * cm4, cm4), vec(cm4),
            mat(cm4, ci4), mat(9 * cm4, cm4), mat(9 * cm4, cm4),
            mat(ci4, cm4),
        ],
        out_specs=[
            pl.BlockSpec((1, th, nb, ci4), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            mat(ci4, cm4), vec(cm4), mat(9 * cm4, cm4), vec(cm4),
            mat(9 * cm4, cm4), vec(cm4), mat(cm4, ci4), vec(ci4),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, nb, ci4), x.dtype),
            jax.ShapeDtypeStruct((ci4, cm4), jnp.float32),
            jax.ShapeDtypeStruct((1, cm4), jnp.float32),
            jax.ShapeDtypeStruct((9 * cm4, cm4), jnp.float32),
            jax.ShapeDtypeStruct((1, cm4), jnp.float32),
            jax.ShapeDtypeStruct((9 * cm4, cm4), jnp.float32),
            jax.ShapeDtypeStruct((1, cm4), jnp.float32),
            jax.ShapeDtypeStruct((cm4, ci4), jnp.float32),
            jax.ShapeDtypeStruct((1, ci4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, th + 8, nb, cl), x.dtype),
            pltpu.VMEM((1, th + 4, nb, cl), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dyp,
      w1p.astype(dt),
      jnp.tile(b1, PACK).reshape(1, cm4).astype(jnp.float32),
      _pack_3x3(w2).astype(dt),
      jnp.tile(b2, PACK).reshape(1, cm4).astype(jnp.float32),
      _pack_3x3(w3).astype(dt),
      jnp.tile(b3, PACK).reshape(1, cm4).astype(jnp.float32),
      jnp.transpose(w1p).astype(dt),
      _pack_3x3(_flip_hwio(w2)).astype(dt),
      _pack_3x3(_flip_hwio(w3)).astype(dt),
      jnp.transpose(w4p).astype(dt))

    (dxp, dw1e, db1e, dw2e, db2e, dw3e, db3e, dw4e, db4e) = outs
    cm_ = cm
    return (dxp.reshape(bsz, h, w, cio),
            _unpack_dw_1x1(dw1e, cio, cm_, w1.dtype).reshape(w1.shape),
            _unpack_db(db1e, cm_, b1.dtype),
            _unpack_dw_3x3(dw2e, cm_, cm_, w2.dtype),
            _unpack_db(db2e, cm_, b2.dtype),
            _unpack_dw_3x3(dw3e, cm_, cm_, w3.dtype),
            _unpack_db(db3e, cm_, b3.dtype),
            _unpack_dw_1x1(dw4e, cm_, cio, w4.dtype).reshape(w4.shape),
            _unpack_db(db4e, cio, b4.dtype))


# ------------------------------------------------------------ public op


def _scale_ref(out, scale, dtype):
    """The ConvResBlock scaling ops in their reference form
    (models/resample.py): reshape-mean pool / broadcast upsample."""
    if scale == "down":
        b, hh, ww, c = out.shape
        out = out.reshape(b, hh // 2, 2, ww // 2, 2, c)
        return (out.sum(axis=(2, 4)) * 0.25).astype(dtype)
    if scale == "up":
        b, hh, ww, c = out.shape
        out = jnp.broadcast_to(out[:, :, None, :, None, :],
                               (b, hh, 2, ww, 2, c))
        return out.reshape(b, hh * 2, ww * 2, c)
    return out


def _unscale_grad(dy, scale):
    """VJP of _scale_ref: down-pool -> 2x2 broadcast x0.25;
    up-broadcast -> 2x2 window sum."""
    if scale == "down":
        b, hh, ww, c = dy.shape
        g = jnp.broadcast_to(dy[:, :, None, :, None, :] * 0.25,
                             (b, hh, 2, ww, 2, c))
        return g.reshape(b, hh * 2, ww * 2, c)
    if scale == "up":
        b, hh, ww, c = dy.shape
        g = dy.reshape(b, hh // 2, 2, ww // 2, 2, c)
        return g.sum(axis=(2, 4))
    return dy


def _reference_impl(x, w1, b1, w2, b2, w3, b3, w4, b4, residual,
                    scale=None):
    """Pure-JAX reference: exactly ConvResBlock's conv core
    (models/resample.py), used for tests and as the numeric spec."""
    dt = x.dtype
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(v, w, b, pad):
        y = lax.conv_general_dilated(v, w.astype(dt), (1, 1),
                                     ((pad, pad), (pad, pad)),
                                     dimension_numbers=dn)
        return y + b.astype(y.dtype)

    def m(v):
        return (_mish(v.astype(jnp.float32))).astype(dt)

    h = conv(m(x), w1.reshape(1, 1, *w1.shape[-2:]) if w1.ndim == 2 else w1,
             b1, 0)
    h = conv(m(h), w2, b2, 1)
    h = conv(m(h), w3, b3, 1)
    h = conv(m(h), w4.reshape(1, 1, *w4.shape[-2:]) if w4.ndim == 2 else w4,
             b4, 0)
    out = x + h if residual else h
    return _scale_ref(out, scale, dt)


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_convres_block(x, w1, b1, w2, b2, w3, b3, w4, b4,
                        residual: bool = True, interpret: bool = False,
                        scale: Optional[str] = None):
    """Fused ConvResBlock conv core (lane-packed Pallas kernels).

    x: (B, H, W, cio); w1: (1,1,cio,cm); w2, w3: (3,3,cm,cm);
    w4: (1,1,cm,cio); biases 1-D.  Returns mish-conv bottleneck output
    (+ x when residual), optionally 2x scaled IN-KERNEL: scale='down'
    applies the reshape-mean 2x2 pool, scale='up' the broadcast
    nearest upsample (reference models/downsampled/convblocks.py:92-159
    composes these around the block; here the whole block+residual+
    scale is one kernel so XLA has no cross-seam fusion left to win).
    Dropout (when active) must stay outside — use scale=None then.
    Backward: the scaling VJP (cheap XLA broadcast/window-sum on dy)
    feeds the existing fused backward kernel.
    Requires W % 4 == 0; on real TPUs the packed lane widths 4*cio and
    4*cm should be multiples of 128 for full efficiency.
    """
    return _fused_forward(x, w1, b1, w2, b2, w3, b3, w4, b4,
                          residual, interpret, scale)


def _vjp_fwd(x, w1, b1, w2, b2, w3, b3, w4, b4, residual, interpret,
             scale):
    out = _fused_forward(x, w1, b1, w2, b2, w3, b3, w4, b4,
                         residual, interpret, scale)
    return out, (x, w1, b1, w2, b2, w3, b3, w4, b4)


def _vjp_bwd(residual, interpret, scale, res, dy):
    x, w1, b1, w2, b2, w3, b3, w4, b4 = res
    dy = _unscale_grad(dy, scale)
    (dx, dw1, db1, dw2, db2, dw3, db3, dw4, db4) = _fused_backward(
        x, w1, b1, w2, b2, w3, b3, w4, b4, dy, residual, interpret)
    return dx, dw1, db1, dw2, db2, dw3, db3, dw4, db4


fused_convres_block.defvjp(_vjp_fwd, _vjp_bwd)
