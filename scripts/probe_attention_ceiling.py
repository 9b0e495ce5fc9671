"""Per-pass practical-ceiling attribution for the fused attention block
(VERDICT r3 item 1): strip each pass down to its payload and time every
intermediate variant, the way conv3x3.py proved the conv ceiling.

Pass A (ctx accumulation) variants:
  A-full     — the shipped kernel's pass A alone
  A-noexp    — exp replaced by identity (cost of the VPU transcendental)
  A-noln     — LN removed, raw x into the kv matmul (cost of LN)
  A-payload  — kv matmul + A-accumulation only (no LN, no exp, no sum)
  A-dma      — DMA in + trivial reduce only (pure traffic floor)

Pass B (output) variants:
  B-full     — the shipped pass B alone
  B-noln     — y = x + x @ W_eff + b (LN removed)
  B-dma      — read + write x through VMEM (pure traffic floor)

Grouped variants: process G batch elements per grid step (grid
bsz/G x nt instead of bsz x nt) to amortize per-grid-step overhead;
the matmuls run per sub-element in an unrolled loop (same MXU work).

    python scripts/probe_attention_ceiling.py [--bs 96] [--shape 128 128]
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

from dddpm_tpu.ops.pallas.attention_block import (  # noqa: E402
    K_CLAMP, _layer_norm_mxu, _pick_tile, attention_block)


def timed(fn, args, scan_len=50):
    return timed_scan(fn, args, scan_len)


# ---------------------------------------------------------------- pass A


def _ctx_kernel_var(x_ref, g_ref, b_ref, wkv_ref, ctx_ref, s_scr, a_scr,
                    *, variant, group):
    j = pl.program_id(1)
    hidden = s_scr.shape[-1]

    @pl.when(j == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)
        a_scr[:] = jnp.zeros_like(a_scr)

    for gi in range(group):
        x = x_ref[gi]
        if variant == "dma":
            # touch the tile, skip all math
            s_scr[gi:gi + 1] += jnp.sum(x[:1, :].astype(jnp.float32),
                                        axis=0, keepdims=True)[:, :hidden]
            continue
        if variant in ("payload", "noln"):
            ln = x
        else:
            ln = _layer_norm_mxu(x, g_ref[:], b_ref[:]).astype(x.dtype)
        kv = jnp.dot(ln, wkv_ref[:], preferred_element_type=jnp.float32)
        if variant == "payload":
            p = kv[:, :hidden]
        elif variant == "noexp":
            p = jnp.minimum(kv[:, :hidden], K_CLAMP)
            s_scr[gi:gi + 1] += jnp.sum(p, axis=0, keepdims=True)
        else:
            p = jnp.exp(jnp.minimum(kv[:, :hidden], K_CLAMP))
            s_scr[gi:gi + 1] += jnp.sum(p, axis=0, keepdims=True)
        a_scr[gi * hidden:(gi + 1) * hidden] += lax.dot_general(
            p.astype(x.dtype), kv[:, hidden:].astype(x.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        a3 = a_scr[:].reshape(group, hidden, hidden)
        s3 = jnp.maximum(s_scr[:], 1.0).reshape(group, hidden, 1)
        ctx_ref[...] = a3 / s3


def make_pass_a(variant, group, tn_target):
    def run(x, g, b, w_kv):
        bsz, n, c = x.shape
        hidden = w_kv.shape[1] // 2
        # constant-VMEM grouping: the x block stays ~tn_target tokens
        tn = _pick_tile(n, max(tn_target // group, 512))
        nt = n // tn
        g2, b2 = g.reshape(1, -1), b.reshape(1, -1)
        return pl.pallas_call(
            partial(_ctx_kernel_var, variant=variant, group=group),
            grid=(bsz // group, nt),
            in_specs=[
                pl.BlockSpec((group, tn, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, 2 * hidden), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group, hidden, hidden),
                                   lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, hidden, hidden),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((group, hidden), jnp.float32),
                pltpu.VMEM((group * hidden, hidden), jnp.float32),
            ],
        )(x, g2, b2, w_kv)

    return run


# ---------------------------------------------------------------- pass B


def _out_kernel_var(x_ref, g_ref, b_ref, weff_ref, bo_ref, y_ref,
                    *, variant, group):
    for gi in range(group):
        x = x_ref[gi]
        if variant == "dma":
            y_ref[gi] = x
            continue
        if variant == "noln":
            ln = x
        else:
            ln = _layer_norm_mxu(x, g_ref[:], b_ref[:]).astype(x.dtype)
        y = jnp.dot(ln, weff_ref[gi].astype(x.dtype),
                    preferred_element_type=jnp.float32) + bo_ref[:]
        y_ref[gi] = (x.astype(jnp.float32) + y).astype(y_ref.dtype)


def make_pass_b(variant, group, tn_target):
    def run(x, g, b, w_eff, bo):
        bsz, n, c = x.shape
        tn = _pick_tile(n, max(tn_target // group, 512))
        nt = n // tn
        g2, b2, bo2 = g.reshape(1, -1), b.reshape(1, -1), bo.reshape(1, -1)
        x_spec = pl.BlockSpec((group, tn, c), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_out_kernel_var, variant=variant, group=group),
            grid=(bsz // group, nt),
            in_specs=[
                x_spec,
                pl.BlockSpec((1, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, c, c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        )(x, g2, b2, w_eff, bo2)

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=96)
    p.add_argument("--shape", type=int, nargs=2, default=[128, 128],
                   help="H W of the latent map")
    p.add_argument("--c", type=int, default=128)
    p.add_argument("--groups", type=int, nargs="*", default=[1, 4, 8])
    args = p.parse_args()
    h, w = args.shape
    c = args.c
    bs, n = args.bs, h * w
    hidden = 128
    tn_target = 8192 if c <= 128 else 4096

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, n, c), jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    wqkv = (jax.random.normal(key, (c, 3 * hidden), jnp.float32) * 0.05
            ).astype(jnp.bfloat16)
    wout = (jax.random.normal(key, (hidden, c), jnp.float32) * 0.05
            ).astype(jnp.bfloat16)
    bout = jnp.zeros((c,), jnp.float32)
    w_q, w_k, w_v = (wqkv.reshape(c, 3, hidden)[:, i] for i in range(3))
    w_kv = jnp.concatenate([w_k, w_v], axis=1)
    w_eff = jax.random.normal(key, (bs, c, c), jnp.bfloat16) * 0.05

    bw = 900e9
    bytes_tile = bs * n * c * 2
    print(f"shape {h}x{w} c{c} bs{bs}  (1-pass traffic floor "
          f"{bytes_tile / bw * 1e3:.3f} ms; "
          f"r/w floor {2 * bytes_tile / bw * 1e3:.3f} ms)")

    dt_full = timed(lambda x: attention_block(x, g, b, wqkv, wout, bout, 32),
                    (x,))
    print(f"full fused block (shipped)          {dt_full * 1e3:8.3f} ms")

    # XLA elementwise baseline: what the compiler's own pipeline gets
    # for one read + one write of the same tensor
    dt_xla = timed(lambda x: x + jnp.bfloat16(1.0), (x,))
    print(f"XLA x+1 (r/w baseline)              {dt_xla * 1e3:8.3f} ms")

    for grp in args.groups:
        if bs % grp:
            continue
        # pass B alone: output is x-shaped, carries directly
        b_noln = make_pass_b("noln", grp, tn_target)
        for variant in ["dma", "noln", "full"]:
            fn = make_pass_b(variant, grp, tn_target)
            try:
                dt = timed(fn, (x, g, b, w_eff, bout))
                print(f"B-{variant:8s} g{grp}                    "
                      f"{dt * 1e3:8.3f} ms")
            except Exception as e:
                print(f"B-{variant:8s} g{grp} FAILED: {str(e)[:120]}")
        dt_bnoln = timed(b_noln, (x, g, b, w_eff, bout))
        # pass A variants, composed with the fixed B-noln sink so the
        # scan carry stays x-shaped; subtract the B-noln cost
        for variant in ["dma", "payload", "noln", "noexp", "full"]:
            v = "exp" if variant == "full" else variant
            fa = make_pass_a(v, grp, tn_target)

            def composed(x, fa=fa):
                ctx = fa(x, g, b, w_kv)
                # fold to a (c, c) effective weight exactly as the
                # production path does (attention_block._fused_forward);
                # a few MFLOPs of XLA einsum, negligible vs the passes —
                # and correct for c != hidden (a plain ctx slice would
                # silently clamp at c > 128 and break the BlockSpec)
                weff = jnp.einsum("ch,bhg,gf->bcf",
                                  w_q.astype(jnp.float32),
                                  ctx.astype(jnp.float32),
                                  wout.astype(jnp.float32)).astype(x.dtype)
                return b_noln(x, g, b, weff, bout)

            try:
                dt = timed(composed, (x,))
                print(f"A-{variant:8s} g{grp}                    "
                      f"{dt * 1e3:8.3f} ms  (={1e3 * (dt - dt_bnoln):.3f} "
                      f"after B-noln)")
            except Exception as e:
                print(f"A-{variant:8s} g{grp} FAILED: {str(e)[:120]}")
        print()


if __name__ == "__main__":
    main()
