"""Diagnose where the fused ConvResBlock forward spends time: build
kernel variants with individual costs removed and time each.

    python scripts/probe_convres_variants.py [--bs 32] [--res 256]

Variants (forward only):
  base      — the shipped kernel (ops/pallas/convres.py)
  rowmask   — (rows,1,1) broadcast masks instead of full-3D iota
  nomask    — masks removed entirely (WRONG at borders; cost probe)
  ninedot   — 3x3 via 9 accumulating (M,32)@(32,32) dots, no im2col
  bf16mish  — mish computed in bf16 (WRONG numerics; cost probe)
  th32      — row tile 32 instead of 16
"""
import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _probe_util import setup_cache, timed_scan  # noqa: E402

setup_cache()

from dddpm_tpu.ops.pallas.convres import _mish  # noqa: E402


# The pre-rewrite (un-packed) kernel's im2col helpers, inlined here when
# the lane-packed rewrite removed them from convres.py: this probe
# benchmarks the PRE-rewrite kernel variants, so it keeps its own copy.
def _wpad(h):
    """Zero-pad the width axis by 1 on each side: (r, w, c) -> (r, w+2, c)."""
    return jnp.pad(h, ((0, 0), (1, 1), (0, 0)))


def _im2col3x3(h, im_ref):
    """im2col for a VALID 3x3 over rows, SAME over width: (r, w, c) ->
    ((r-2)*w, 9*c), staged through the im_ref VMEM scratch."""
    r, w, c = h.shape
    hp = _wpad(h)
    m = (r - 2) * w
    for ky in range(3):
        for kx in range(3):
            t = ky * 3 + kx
            im_ref[0:m, t * c:(t + 1) * c] = (
                hp[ky:ky + r - 2, kx:kx + w, :].reshape(m, c))
    return im_ref[0:m, :]


def _row_mask_3d(rows, start, h, width, ch, dtype):
    gr = lax.broadcasted_iota(jnp.int32, (rows, width, ch), 0) + start
    return jnp.where((gr >= 0) & (gr < h),
                     jnp.ones((), dtype), jnp.zeros((), dtype))


def _row_mask_1d(rows, start, h, dtype):
    gr = lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + start
    return jnp.where((gr >= 0) & (gr < h),
                     jnp.ones((), dtype), jnp.zeros((), dtype))


def _conv3x3_im2col(h, w2r, im_ref, bias):
    r, w, c = h.shape
    y = jnp.dot(_im2col3x3(h, im_ref), w2r,
                preferred_element_type=jnp.float32)
    y = y.reshape(r - 2, w, w2r.shape[-1])
    return y + bias


def _conv3x3_ninedot(h, w2r, im_ref, bias):
    r, w, c = h.shape
    hp = _wpad(h)
    co = w2r.shape[-1]
    m = (r - 2) * w
    acc = None
    for ky in range(3):
        for kx in range(3):
            t = ky * 3 + kx
            piece = hp[ky:ky + r - 2, kx:kx + w, :].reshape(m, c)
            d = jnp.dot(piece, w2r[t * c:(t + 1) * c, :],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return acc.reshape(r - 2, w, co) + bias


def make_fwd(mask_mode, conv_mode, mish_dtype, th_):
    def kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               w4_ref, b4_ref, y_ref, xt, im, sem, *, th, h, residual):
        b = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            xp_ref.at[pl.ds(b, 1), pl.ds(j * th, th + 4)], xt, sem)
        dma.start()
        dma.wait()
        cio = w1_ref.shape[0]
        x = xt[0][:, :, :cio]
        rows1, w, _ = x.shape
        cm = w1_ref.shape[-1]
        dt = x.dtype

        def mish_c(v):
            if mish_dtype == "bf16":
                return _mish(v.astype(dt) if v.dtype != dt else v)
            return _mish(v.astype(jnp.float32))

        def mask(val, rows, start):
            if mask_mode == "none":
                return val
            if mask_mode == "row":
                return val * _row_mask_1d(rows, start, h, val.dtype)
            return val * _row_mask_3d(rows, start, h, w, val.shape[-1],
                                      val.dtype)

        conv = (_conv3x3_im2col if conv_mode == "im2col"
                else _conv3x3_ninedot)

        m0 = mish_c(x).astype(dt)
        p1 = (jnp.dot(m0.reshape(rows1 * w, cio), w1_ref[:],
                      preferred_element_type=jnp.float32)
              + b1_ref[:]).reshape(rows1, w, cm)
        m1 = mask(mish_c(p1).astype(dt), rows1, j * th - 2)
        p2 = conv(m1, w2_ref[:], im, b2_ref[:])
        m2 = mask(mish_c(p2).astype(dt), th + 2, j * th - 1)
        p3 = conv(m2, w3_ref[:], im, b3_ref[:])
        m3 = mish_c(p3).astype(dt)
        p4 = (jnp.dot(m3.reshape(th * w, cm), w4_ref[:],
                      preferred_element_type=jnp.float32)
              + b4_ref[:]).reshape(th, w, cio)
        p4 = p4 + x[2:th + 2].astype(jnp.float32)
        y_ref[0] = p4.astype(y_ref.dtype)

    def fwd(x, w1, b1, w2, b2, w3, b3, w4, b4):
        bsz, h, w, cio = x.shape
        cm = w1.shape[-1]
        th = min(th_, h)
        cl = -(-cio // 128) * 128
        xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, cl - cio)))
        dt = x.dtype
        vec = lambda d: pl.BlockSpec((1, d), lambda b, j: (0, 0),
                                     memory_space=pltpu.VMEM)
        mat = lambda r, c: pl.BlockSpec((r, c), lambda b, j: (0, 0),
                                        memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(kernel, th=th, h=h, residual=True),
            grid=(bsz, h // th),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                mat(cio, cm), vec(cm), mat(9 * cm, cm), vec(cm),
                mat(9 * cm, cm), vec(cm), mat(cm, cio), vec(cio),
            ],
            out_specs=pl.BlockSpec((1, th, w, cio),
                                   lambda b, j: (b, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, h, w, cio), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((1, th + 4, w, cl), x.dtype),
                pltpu.VMEM(((th + 2) * w, 9 * cm), x.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp,
          w1.reshape(cio, cm).astype(dt),
          b1.reshape(1, cm).astype(jnp.float32),
          w2.reshape(9 * cm, cm).astype(dt),
          b2.reshape(1, cm).astype(jnp.float32),
          w3.reshape(9 * cm, cm).astype(dt),
          b3.reshape(1, cm).astype(jnp.float32),
          w4.reshape(cm, cio).astype(dt),
          b4.reshape(1, cio).astype(jnp.float32))

    return fwd


def timed(fn, x, ws, scan_len=20):
    wrapped = lambda c, *ws: fn(c, *ws).astype(c.dtype)
    return timed_scan(wrapped, (x, *ws), scan_len, reps=2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--res", type=int, default=256)
    args = p.parse_args()
    bs, res = args.bs, args.res
    cio, cm = 64, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    x = jax.random.normal(ks[0], (bs, res, res, cio), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (1, 1, cio, cm)) * (1 / np.sqrt(cio))
    b1 = jax.random.normal(ks[2], (cm,)) * 0.1
    w2 = jax.random.normal(ks[3], (3, 3, cm, cm)) * (1 / np.sqrt(9 * cm))
    b2 = jax.random.normal(ks[4], (cm,)) * 0.1
    w3 = jax.random.normal(ks[5], (3, 3, cm, cm)) * (1 / np.sqrt(9 * cm))
    b3 = jax.random.normal(ks[6], (cm,)) * 0.1
    w4 = jax.random.normal(ks[7], (1, 1, cm, cio)) * (1 / np.sqrt(cm))
    b4 = jax.random.normal(ks[8], (cio,)) * 0.1
    ws = (w1, b1, w2, b2, w3, b3, w4, b4)

    variants = [
        ("base     ", make_fwd("full", "im2col", "f32", 16)),
        ("rowmask  ", make_fwd("row", "im2col", "f32", 16)),
        ("nomask   ", make_fwd("none", "im2col", "f32", 16)),
        ("ninedot  ", make_fwd("row", "ninedot", "f32", 16)),
        ("bf16mish ", make_fwd("row", "im2col", "bf16", 16)),
        ("th32     ", make_fwd("row", "im2col", "f32", 32)),
        ("kitchen  ", make_fwd("none", "ninedot", "bf16", 32)),
    ]
    for name, fn in variants:
        try:
            dt = timed(fn, x, ws)
            print(f"{name} {dt*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
