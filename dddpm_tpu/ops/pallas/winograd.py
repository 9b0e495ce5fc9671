"""Winograd F(2x2, 3x3) fused convolution kernel for TPU.

Computes y = conv3x3(prologue(x), w) + b with 2.25x fewer MXU MACs than
direct convolution (see ops/winograd.py for the math and the XLA
reference).  The input/output transforms are +-1 / +-0.5 butterflies
executed on the VPU over VMEM-resident row bands, overlapping with the
16 tap matmuls on the MXU; the transformed-tile tensors (4x the input
volume — the reason a naive XLA Winograd loses to direct conv) never
touch HBM.

Optional fused prologue: mish activation applied to the input stream
(the Block structure conv -> GN -> mish means the NEXT conv can absorb
the previous Block's activation; see models/blocks.py).

Grid = (B, H / TH) row bands, halo rows via clamped single-row block
specs exactly like ops/pallas/conv3x3.py.  Gradients: the kernel is
numerically a plain 3x3 convolution, so custom_vjp re-derives the
backward through the XLA conv (same pattern as the attention block).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dddpm_tpu.ops.math import mish
from dddpm_tpu.ops.winograd import transform_weights


def _col_components(t, w):
    """4 column phases of a zero-padded (R, W, C) strip, stride 2.

    Tile n's column j reads padded column 2n + j (padding 1 left/right).
    Strided slices >2D lower to unsupported gathers in Mosaic, so the
    stride-2 phase split is expressed as a (free) reshape: padded column
    2n + p = reshape(R, W/2+1, 2, C)[:, n, p].
    """
    r, _, c = t.shape
    zero = jnp.zeros((r, 1, c), t.dtype)
    tp = jnp.concatenate([zero, t, zero], axis=1)       # (R, W+2, C)
    tp = tp.reshape(r, w // 2 + 1, 2, c)
    p0, p1 = tp[:, :, 0], tp[:, :, 1]
    return [p0[:, :-1], p1[:, :-1], p0[:, 1:], p1[:, 1:]]


def _winograd_kernel(x_ref, top_ref, bot_ref, u_ref, b_ref, y_ref, *,
                     th, w, cin, cout, apply_mish):
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    x = x_ref[0].astype(jnp.float32)                    # (TH, W, Cin)
    # arithmetic halo masking ((j==0)/(j==nt-1) rows are out-of-image);
    # jnp.where on the halo rows trips a jax closed_call lowering bug
    # inside scan+pallas, multiplication does not
    top = top_ref[0].astype(jnp.float32) * (j != 0).astype(jnp.float32)
    bot = (bot_ref[0].astype(jnp.float32)
           * (j != nt - 1).astype(jnp.float32))
    band = jnp.concatenate([top, x, bot], axis=0)       # (TH+2, W, Cin)
    if apply_mish:
        band = mish(band)

    # ---- input transform: rows (B^T on the row axis) ----------------
    # tile-row tr needs band rows 2tr .. 2tr+3; express the stride-2
    # row split as a reshape (Mosaic only lowers 2D gathers)
    bq = band.reshape((th + 2) // 2, 2, w, cin)
    q0, q1 = bq[:, 0], bq[:, 1]                         # band[2r], band[2r+1]
    r0, r1 = q0[:-1], q1[:-1]
    r2, r3 = q0[1:], q1[1:]                             # (TH/2, W, Cin)
    t = (r0 - r2, r1 + r2, r2 - r1, r1 - r3)

    # ---- cols (B^T on the col axis), matmul against U ---------------
    mrows = (th // 2) * (w // 2)
    ms = []
    for i in range(4):
        c0, c1, c2, c3 = _col_components(t[i], w)
        vs = (c0 - c2, c1 + c2, c2 - c1, c1 - c3)
        for jj in range(4):
            v = vs[jj].reshape(mrows, cin).astype(jnp.bfloat16)
            ms.append(jnp.dot(v, u_ref[i * 4 + jj],
                              preferred_element_type=jnp.float32))

    # ---- inverse transform: Y = A^T M A -----------------------------
    z = []
    for jj in range(4):
        m0, m1, m2, m3 = ms[jj], ms[4 + jj], ms[8 + jj], ms[12 + jj]
        z.append((m0 + m1 + m2, m1 - m2 - m3))
    y_pq = [[z[0][p] + z[1][p] + z[2][p], z[1][p] - z[2][p] - z[3][p]]
            for p in range(2)]                          # [p][q] (mrows, Cout)

    bias = b_ref[:].astype(jnp.float32)
    th2, tw2 = th // 2, w // 2
    rows = []
    for p in range(2):
        a = y_pq[p][0].reshape(th2, tw2, cout)
        bq = y_pq[p][1].reshape(th2, tw2, cout)
        # interleave columns: (TH/2, W, C)
        rows.append(jnp.stack([a, bq], axis=2).reshape(th2, w, cout))
    # interleave rows: (TH, W, C)
    y = jnp.stack(rows, axis=1).reshape(th, w, cout) + bias
    y_ref[0] = y.astype(y_ref.dtype)


def conv3x3_winograd(x, w, b, *, apply_mish: bool = False, th: int = 8,
                     interpret: bool = False):
    """Winograd 3x3 'SAME' conv: x (B,H,W,Cin), w (3,3,Cin,Cout), b (Cout,).

    H must be a multiple of th (even), W even.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert h % th == 0 and th % 2 == 0 and wd % 2 == 0, (h, th, wd)
    nt = h // th

    u = transform_weights(w).reshape(16, cin, cout).astype(jnp.bfloat16)
    b2 = b.reshape(1, cout)

    x_spec = pl.BlockSpec((1, th, wd, cin), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    top_spec = pl.BlockSpec(
        (1, 1, wd, cin),
        lambda i, j: (i, jnp.maximum(j * th - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    bot_spec = pl.BlockSpec(
        (1, 1, wd, cin),
        lambda i, j: (i, jnp.minimum((j + 1) * th, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((16, cin, cout), lambda i, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, th, wd, cout), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_winograd_kernel, th=th, w=wd, cin=cin, cout=cout,
                apply_mish=apply_mish),
        grid=(bsz, nt),
        in_specs=[x_spec, top_spec, bot_spec, u_spec, b_spec],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        interpret=interpret,
    )(x, x, x, u, b2)
