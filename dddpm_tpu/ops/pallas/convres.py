"""Fully fused ConvResBlock bottleneck: mish -> 1x1 -> mish -> 3x3 ->
mish -> 3x3 -> mish -> 1x1 (+ residual), forward AND backward as Pallas
kernels.

Why: the dDDPM x3 256^2 train step is ~94% resampler ConvResBlocks
(reference models/downsampled/convblocks.py:92-130), and a single plain
block at 256^2 c64 bs32 measures 26.7 ms under grad on a v5e chip while
its bare-GEMM equivalent is ~6 ms (scripts/probe_resampler.py).  Two
structural causes the XLA path cannot fix:

- the 3x3 convs are C=32 -> 32: as XLA schedules them the MXU sees
  K=N=32 (~6% utilization).  Here each 3x3 is an im2col GEMM with
  K = 9*32 = 288 built INSIDE VMEM (the im2col tensor never exists in
  HBM), lifting MXU depth utilization ~3x;
- XLA round-trips every intermediate (4 convs + 4 mish) through HBM:
  ~1.4 GB per block forward at bs 32.  Here the forward reads x once
  and writes y once (~0.5 GB), and the backward reads x + dy and writes
  dx, recomputing the forward intermediates in VMEM flash-style instead
  of storing them.

Grid: (B, H/TILE_H), sequential on TPU.  Row tiles carry a halo (2 rows
forward, 4 backward) DMA'd from a row-padded copy of the input; weight
gradients accumulate across grid steps directly in their f32 output
blocks (constant index_map -> the block stays resident in VMEM for the
whole kernel), initialized at the first step.

Out-of-image halo rows are masked where the math requires true zeros
(conv SAME padding semantics: mish(0 @ W + b) != b-term, so masks are
load-bearing; on the gradient side dy's zero padding makes g3 vanish
automatically but g2 needs an explicit mask).

Equivalence and gradient tests vs the pure-JAX reference:
tests/test_convres_kernel.py (interpreter mode on CPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish(x):
    """Mish in f32 (matches ops.math.mish up to compute precision)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def _dmish(x):
    """mish'(x) = t + x * s * (1 - t^2), t = tanh(softplus(x))."""
    t = jnp.tanh(jax.nn.softplus(x))
    s = jax.nn.sigmoid(x)
    return t + x * s * (1.0 - t * t)


def _row_mask(rows, start_global, h, width, ch, dtype):
    """(rows, width, ch) mask: 1 where the global row index is inside
    [0, h), 0 on out-of-image halo rows."""
    gr = lax.broadcasted_iota(jnp.int32, (rows, width, ch), 0) + start_global
    return jnp.where((gr >= 0) & (gr < h),
                     jnp.ones((), dtype), jnp.zeros((), dtype))


def _wpad(h):
    """Zero-pad the width axis by 1 on each side (conv SAME in W)."""
    r, w, c = h.shape
    z = jnp.zeros((r, 1, c), h.dtype)
    return jnp.concatenate([z, h, z], axis=1)


def _im2col3x3(h, im_ref):
    """(R, W, C) -> ((R-2)*W, 9C) patch matrix, taps in (ky, kx, ci)
    order — matching an HWIO kernel reshaped to (9C, Cout).

    Built by STORING each tap slice into a VMEM scratch ref and reading
    the assembled matrix back: a direct lane-dim jnp.concatenate of the
    nine 32-lane slices is unimplemented in Mosaic when the pieces
    carry different sublane offsets (row slices at +0/+1/+2); the
    scratch round-trip normalizes the layout."""
    r, w, c = h.shape
    hp = _wpad(h)
    m = (r - 2) * w
    for ky in range(3):
        for kx in range(3):
            t = ky * 3 + kx
            piece = hp[ky:ky + r - 2, kx:kx + w, :].reshape(m, c)
            im_ref[0:m, t * c:(t + 1) * c] = piece
    return im_ref[0:m, :]


def _conv3x3_rows(h, w2r, im_ref, bias=None):
    """Valid-in-H, SAME-in-W 3x3 conv of (R, W, C) -> (R-2, W, Cout)
    f32.  h rows must already be zero outside the image."""
    r, w, c = h.shape
    y = jnp.dot(_im2col3x3(h, im_ref), w2r,
                preferred_element_type=jnp.float32)
    y = y.reshape(r - 2, w, w2r.shape[-1])
    return y if bias is None else y + bias


def _flip_io(w):
    """HWIO (3,3,ci,co) -> transposed-conv kernel (3,3,co,ci), spatially
    flipped, as the (9*co, ci) im2col matrix."""
    co = w.shape[-1]
    return w[::-1, ::-1].transpose(0, 1, 3, 2).reshape(9 * co, w.shape[2])


# --------------------------------------------------------------- forward


def _fwd_kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                w4_ref, b4_ref, y_ref, xt, im, sem, *, th, h, residual):
    b = pl.program_id(0)
    j = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_ref.at[pl.ds(b, 1), pl.ds(j * th, th + 4)], xt, sem)
    dma.start()
    dma.wait()

    x = xt[0]                                  # (th+4, W, cio), x dtype
    rows1, w, cio = x.shape
    cm = w1_ref.shape[-1]
    dt = x.dtype

    m0 = _mish(x.astype(jnp.float32)).astype(dt)
    p1 = (jnp.dot(m0.reshape(rows1 * w, cio), w1_ref[:],
                  preferred_element_type=jnp.float32)
          + b1_ref[:]).reshape(rows1, w, cm)
    m1 = _mish(p1).astype(dt)
    # conv SAME pads with TRUE zeros outside the image; halo rows that
    # fall outside must be zeroed (mish(b1) != 0 there otherwise)
    m1 = m1 * _row_mask(rows1, j * th - 2, h, w, cm, dt)

    p2 = _conv3x3_rows(m1, w2_ref[:], im, b2_ref[:])      # (th+2, W, cm)
    m2 = _mish(p2).astype(dt)
    m2 = m2 * _row_mask(th + 2, j * th - 1, h, w, cm, dt)

    p3 = _conv3x3_rows(m2, w3_ref[:], im, b3_ref[:])      # (th, W, cm)
    m3 = _mish(p3).astype(dt)

    p4 = (jnp.dot(m3.reshape(th * w, cm), w4_ref[:],
                  preferred_element_type=jnp.float32)
          + b4_ref[:]).reshape(th, w, cio)
    if residual:
        p4 = p4 + x[2:th + 2].astype(jnp.float32)
    y_ref[0] = p4.astype(y_ref.dtype)


def _fused_forward(x, w1, b1, w2, b2, w3, b3, w4, b4, residual,
                   interpret=False):
    interpret = interpret or jax.default_backend() == "cpu"
    bsz, h, w, cio = x.shape
    cm = w1.shape[-1]
    th = min(16, h)
    assert h % th == 0, (h, th)

    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    dt = x.dtype

    vec = lambda d: pl.BlockSpec((1, d), lambda b, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda b, j: (0, 0),
                                    memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_fwd_kernel, th=th, h=h, residual=residual),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xp, DMA'd manually
            mat(cio, cm), vec(cm), mat(9 * cm, cm), vec(cm),
            mat(9 * cm, cm), vec(cm), mat(cm, cio), vec(cio),
        ],
        out_specs=pl.BlockSpec((1, th, w, cio), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cio), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, th + 4, w, cio), x.dtype),
            pltpu.VMEM(((th + 2) * w, 9 * cm), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp,
      w1.reshape(cio, cm).astype(dt),
      b1.reshape(1, cm).astype(jnp.float32),
      w2.reshape(9 * cm, cm).astype(dt),
      b2.reshape(1, cm).astype(jnp.float32),
      w3.reshape(9 * cm, cm).astype(dt),
      b3.reshape(1, cm).astype(jnp.float32),
      w4.reshape(cm, cio).astype(dt),
      b4.reshape(1, cio).astype(jnp.float32))


# -------------------------------------------------------------- backward


def _bwd_kernel(xp_ref, dyp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, b3_ref, w1t_ref, w2f_ref, w3f_ref, w4t_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dw3_ref, db3_ref, dw4_ref, db4_ref,
                xt, dyt, im, sem, *, th, h, residual):
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

    x = xt[0]                                   # (th+8, W, cio)
    dy = dyt[0].astype(jnp.float32)             # (th+4, W, cio)
    rows0, w, cio = x.shape
    cm = w1_ref.shape[-1]
    dt = x.dtype

    @pl.when((b == 0) & (j == 0))
    def _():
        for ref in (dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dw3_ref, db3_ref, dw4_ref, db4_ref):
            ref[:] = jnp.zeros_like(ref)

    # ---- forward recompute, flash-style (rows shrink 2 per 3x3)
    xf = x.astype(jnp.float32)
    m0 = _mish(xf).astype(dt)                                  # th+8
    p1 = (jnp.dot(m0.reshape(rows0 * w, cio), w1_ref[:],
                  preferred_element_type=jnp.float32)
          + b1_ref[:]).reshape(rows0, w, cm)
    m1 = (_mish(p1).astype(dt)
          * _row_mask(rows0, j * th - 4, h, w, cm, dt))
    p2 = _conv3x3_rows(m1, w2_ref[:], im, b2_ref[:])               # th+6
    m2 = (_mish(p2).astype(dt)
          * _row_mask(th + 6, j * th - 3, h, w, cm, dt))
    p3 = _conv3x3_rows(m2, w3_ref[:], im, b3_ref[:])               # th+4
    m3 = _mish(p3).astype(dt)                                  # th+4

    # ---- gradient chain (dy's zero halo rows make g3 vanish outside
    # the image; g2 gets an explicit mask)
    g4 = dy                                                    # th+4
    u3 = jnp.dot(g4.reshape((th + 4) * w, cio).astype(dt), w4t_ref[:],
                 preferred_element_type=jnp.float32
                 ).reshape(th + 4, w, cm)
    g3 = (u3 * _dmish(p3)).astype(dt)                          # th+4
    u2 = _conv3x3_rows(g3, w3f_ref[:], im)                     # th+2
    g2 = (u2 * _dmish(p2[2:th + 4])).astype(dt)
    g2 = g2 * _row_mask(th + 2, j * th - 1, h, w, cm, dt)
    u1 = _conv3x3_rows(g2, w2f_ref[:], im)                     # th
    g1 = (u1 * _dmish(p1[4:th + 4])).astype(dt)
    u0 = jnp.dot(g1.reshape(th * w, cm), w1t_ref[:],
                 preferred_element_type=jnp.float32
                 ).reshape(th, w, cio)
    dx = u0 * _dmish(xf[4:th + 4])
    if residual:
        dx = dx + dy[2:th + 2]
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # ---- parameter gradients over the tile's central rows only
    cdims = (((0,), (0,)), ((), ()))
    g4c = g4[2:th + 2].reshape(th * w, cio).astype(dt)
    m3c = m3[2:th + 2].reshape(th * w, cm)
    dw4_ref[:] += lax.dot_general(m3c, g4c, cdims,
                                  preferred_element_type=jnp.float32)
    db4_ref[:] += jnp.sum(g4c.astype(jnp.float32), axis=0, keepdims=True)

    g3c = g3[2:th + 2].reshape(th * w, cm)
    im3 = _im2col3x3(m2[2:th + 4], im)                 # patches for rows T
    dw3_ref[:] += lax.dot_general(im3, g3c, cdims,
                                  preferred_element_type=jnp.float32)
    db3_ref[:] += jnp.sum(g3c.astype(jnp.float32), axis=0, keepdims=True)

    g2c = g2[1:th + 1].reshape(th * w, cm)
    im2 = _im2col3x3(m1[3:th + 5], im)
    dw2_ref[:] += lax.dot_general(im2, g2c, cdims,
                                  preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(g2c.astype(jnp.float32), axis=0, keepdims=True)

    g1c = g1.reshape(th * w, cm)
    m0c = m0[4:th + 4].reshape(th * w, cio)
    dw1_ref[:] += lax.dot_general(m0c, g1c, cdims,
                                  preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(g1c.astype(jnp.float32), axis=0, keepdims=True)


def _fused_backward(x, w1, b1, w2, b2, w3, b3, w4, b4, dy, residual,
                    interpret=False):
    interpret = interpret or jax.default_backend() == "cpu"
    bsz, h, w, cio = x.shape
    cm = w1.shape[-1]
    th = min(16, h)

    xp = jnp.pad(x, ((0, 0), (4, 4), (0, 0), (0, 0)))
    dyp = jnp.pad(dy.astype(x.dtype), ((0, 0), (2, 2), (0, 0), (0, 0)))
    dt = x.dtype

    vec = lambda d: pl.BlockSpec((1, d), lambda b, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda b, j: (0, 0),
                                    memory_space=pltpu.VMEM)
    acc = lambda r, c: pl.BlockSpec((r, c), lambda b, j: (0, 0),
                                    memory_space=pltpu.VMEM)

    w2r = w2.reshape(9 * cm, cm).astype(dt)
    w3r = w3.reshape(9 * cm, cm).astype(dt)

    outs = pl.pallas_call(
        partial(_bwd_kernel, th=th, h=h, residual=residual),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xp
            pl.BlockSpec(memory_space=pl.ANY),   # dyp
            mat(cio, cm), vec(cm), mat(9 * cm, cm), vec(cm),
            mat(9 * cm, cm), vec(cm),
            mat(cm, cio), mat(9 * cm, cm), mat(9 * cm, cm), mat(cio, cm),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w, cio), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            acc(cio, cm), acc(1, cm), acc(9 * cm, cm), acc(1, cm),
            acc(9 * cm, cm), acc(1, cm), acc(cm, cio), acc(1, cio),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, cio), x.dtype),
            jax.ShapeDtypeStruct((cio, cm), jnp.float32),
            jax.ShapeDtypeStruct((1, cm), jnp.float32),
            jax.ShapeDtypeStruct((9 * cm, cm), jnp.float32),
            jax.ShapeDtypeStruct((1, cm), jnp.float32),
            jax.ShapeDtypeStruct((9 * cm, cm), jnp.float32),
            jax.ShapeDtypeStruct((1, cm), jnp.float32),
            jax.ShapeDtypeStruct((cm, cio), jnp.float32),
            jax.ShapeDtypeStruct((1, cio), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, th + 8, w, cio), x.dtype),
            pltpu.VMEM((1, th + 4, w, cio), x.dtype),
            pltpu.VMEM(((th + 6) * w, 9 * cm), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, dyp,
      w1.reshape(cio, cm).astype(dt),
      b1.reshape(1, cm).astype(jnp.float32),
      w2r, b2.reshape(1, cm).astype(jnp.float32),
      w3r, b3.reshape(1, cm).astype(jnp.float32),
      jnp.transpose(w1.reshape(cio, cm)).astype(dt),
      _flip_io(w2).astype(dt),
      _flip_io(w3).astype(dt),
      jnp.transpose(w4.reshape(cm, cio)).astype(dt))

    dx, dw1, db1, dw2, db2, dw3, db3, dw4, db4 = outs
    return (dx,
            dw1.reshape(w1.shape).astype(w1.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            dw2.reshape(w2.shape).astype(w2.dtype),
            db2.reshape(b2.shape).astype(b2.dtype),
            dw3.reshape(w3.shape).astype(w3.dtype),
            db3.reshape(b3.shape).astype(b3.dtype),
            dw4.reshape(w4.shape).astype(w4.dtype),
            db4.reshape(b4.shape).astype(b4.dtype))


# ------------------------------------------------------------ public op


def _reference_impl(x, w1, b1, w2, b2, w3, b3, w4, b4, residual):
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
    return x + h if residual else h


@partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_convres_block(x, w1, b1, w2, b2, w3, b3, w4, b4,
                        residual: bool = True, interpret: bool = False):
    """Fused ConvResBlock conv core.

    x: (B, H, W, cio); w1: (1,1,cio,cm); w2, w3: (3,3,cm,cm);
    w4: (1,1,cm,cio); biases 1-D.  Returns mish-conv bottleneck output
    (+ x when residual).  Up/down scaling and dropout stay outside.
    """
    return _fused_forward(x, w1, b1, w2, b2, w3, b3, w4, b4,
                          residual, interpret)


def _vjp_fwd(x, w1, b1, w2, b2, w3, b3, w4, b4, residual, interpret):
    out = _fused_forward(x, w1, b1, w2, b2, w3, b3, w4, b4,
                         residual, interpret)
    return out, (x, w1, b1, w2, b2, w3, b3, w4, b4)


def _vjp_bwd(residual, interpret, res, dy):
    x, w1, b1, w2, b2, w3, b3, w4, b4 = res
    (dx, dw1, db1, dw2, db2, dw3, db3, dw4, db4) = _fused_backward(
        x, w1, b1, w2, b2, w3, b3, w4, b4, dy, residual, interpret)
    return dx, dw1, db1, dw2, db2, dw3, db3, dw4, db4


fused_convres_block.defvjp(_vjp_fwd, _vjp_bwd)
