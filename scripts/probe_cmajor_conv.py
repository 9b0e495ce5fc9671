"""De-risk probe: one 3x3 SAME conv (C=32 -> 32) at 256^2 bs 32 in
channels-major layout (C sublanes, W lanes), vs the XLA NHWC conv.

In NHWC the MXU sees N=32 of 128 lanes (4x waste).  Channels-major
computes Y[co, h, :] = Wmat (co, 9ci) @ P[h] (9ci, W) with N = W = 256
full lanes; the patch stack P is assembled from sublane-aligned 32-row
pieces (lane-rolled for kx, row-shifted for ky).

    python scripts/probe_cmajor_conv.py [--bs 32] [--res 256]
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _kernel(x_ref, w_ref, y_ref, pt, sem, *, th, h, wpx, cm):
    b = pl.program_id(0)
    j = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_ref.at[pl.ds(b, 1), pl.ds(0, cm), pl.ds(j * th, th + 8)], pt, sem)
    dma.start()
    dma.wait()
    x = pt[0]                                 # (cm, th+8, W); rows j*th-4..
    dt = x.dtype
    zc = jnp.zeros((cm, 1), dt)

    rows = []
    for hh in range(th):
        # global output row = j*th + hh; input rows needed: +3..+5 in pt
        pieces = []
        for ky in range(3):
            r = x[:, hh + 3 + ky, :]          # (cm, W)
            for kx in range(3):
                # static lane shift w/ zero fill == conv SAME in W
                if kx == 0:
                    p = jnp.concatenate([zc, r[:, :wpx - 1]], axis=1)
                elif kx == 2:
                    p = jnp.concatenate([r[:, 1:], zc], axis=1)
                else:
                    p = r
                pieces.append(p)
        pmat = jnp.concatenate(pieces, axis=0)       # (9cm, W)
        y = jnp.dot(w_ref[:], pmat, preferred_element_type=jnp.float32)
        rows.append(y.astype(dt))
    y_ref[0] = jnp.stack(rows, axis=1)               # (cm, th, W)


def cmajor_conv(x, wmat, th=16):
    """x: (B, C, H, W) channels-major; wmat: (co, 9*ci) tap-major
    (ky, kx, ci) rows."""
    bsz, cm, h, wpx = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (0, 0)))
    return pl.pallas_call(
        partial(_kernel, th=th, h=h, wpx=wpx, cm=cm),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((wmat.shape[0], wmat.shape[1]),
                         lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cm, th, wpx), lambda b, j: (b, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, cm, h, wpx), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, cm, th + 8, wpx), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, wmat)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--cm", type=int, default=32)
    args = p.parse_args()
    bs, res, cm = args.bs, args.res, args.cm

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    xc = jax.random.normal(k1, (bs, cm, res, res), jnp.bfloat16)
    w = (jax.random.normal(k2, (3, 3, cm, cm)) / np.sqrt(9 * cm))
    # wmat rows ordered (ky, kx, ci) to match the kernel's piece order
    wmat = w.transpose(3, 0, 1, 2).reshape(cm, 9 * cm).astype(jnp.bfloat16)

    # --- correctness vs XLA NHWC conv
    y = cmajor_conv(xc, wmat)
    xh = xc.transpose(0, 2, 3, 1)
    yr = lax.conv_general_dilated(
        xh.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yrc = yr.transpose(0, 3, 1, 2)
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - yrc)))
    print(f"max abs err vs XLA: {err:.5f}")

    # --- timing: scan-in-jit
    def mk(fn):
        def chain(x, w):
            def body(c, _):
                return fn(c, w).astype(c.dtype), None
            y, _ = lax.scan(body, x, None, length=20)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(chain)

    def xla_conv(xh_, w_):
        return lax.conv_general_dilated(
            xh_, w_.astype(xh_.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for name, fn, xx, ww in (
            ("cmajor", cmajor_conv, xc, wmat),
            ("xla-nhwc", xla_conv, xh.astype(jnp.bfloat16), w)):
        chain = mk(fn)
        _ = float(chain(xx, ww))
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(chain(xx, ww))
            best = min(best, (time.perf_counter() - t0) / 20)
        print(f"{name:9s} {best*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
