"""Fully fused attention block: LayerNorm -> qkv projection -> linear
attention -> output projection -> residual, as two Pallas passes.

Why: on a v5e chip the unfused block is bandwidth-bound, not
FLOPs-bound — the qkv projection alone writes a 3x-width tensor, the
(3, heads, d) split copies it again, the softmax makes f32 round trips,
and the two einsums shuffle layouts (~1.6 GB of HBM traffic per UNet
eval at the 128^2 latent; measured 43% of eval time unfused).

Pass A (ctx/W_eff): stream x token tiles; LN in-register;
kv = ln @ [Wk|Wv] (one matmul, 2*hidden wide); accumulate
A += exp(k)^T v and s += sum exp(k) in f32 with the matmul operands in
the input dtype (bf16 on the production path — an f32 MXU matmul costs
multiple passes, and the f32->bf16 rounding of softmax weights is far
below the bf16 noise of the surrounding network).  At the last tile,
fold W_eff = Wq @ blockdiag(A / s) @ Wout in-register: associativity
collapses the q-projection, context application and out-projection
into ONE (C, C) token matmul — ((ln@Wq) @ ctx) @ Wout ==
ln @ (Wq @ ctx @ Wout).

Pass B (out): stream x tiles again; LN recomputed (cheaper than
storing it); y = x + ln @ W_eff + b_out.

No flash-style running max: k = LN(x) @ Wk is LayerNorm-bounded, so
exp(k) cannot overflow f32 in any realistic regime (softmax is
shift-invariant, the shift is only an overflow guard); k is clamped at
K_CLAMP as a belt-and-braces bound, and _reference_impl applies the
SAME clamp so the custom-VJP backward stays consistent with the fused
forward even in the (never-trained-into) clamped regime.  This removes
the per-tile max reduce and the (hidden, hidden) f32 rescale of the
accumulator.

LayerNorm preserves the reference quirk exactly: biased variance, eps
added to the *std* (models/blocks.py ChannelLayerNorm; reference
models/unet/blocks.py:50-60).  Inside the kernels the channel
reductions run on the MXU (dot with a ones matrix, parallel-moments
variance — see _layer_norm_mxu): lane-axis VPU reductions were 27% of
the whole block's time at the 128^2 shape.

Blocks with few tokens (N <= 512, i.e. the 16^2 latents) take the
plain XLA einsum path instead: two pallas dispatches cost more than
fusion saves there (measured in scripts/probe_attention_shapes.py).

Gradients: jax.custom_vjp re-derives the backward pass from the
identical pure-JAX computation.

This two-pass shape is the measured practical ceiling on this chip:
pass B runs at XLA's own elementwise r/w rate and pass A is MXU-bound
at >= nominal peak for its payload; the single-dispatch redesigns
(resident-output and phased-grid, kept below behind DDDPM_ATTN_ONE_PASS)
both measured 37-51% slower despite 33% less HBM traffic.  Full bound
table: BENCH_NOTES.md "Attention practical ceiling".
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5
# A/B escape hatch for perf probes only (scripts/probe_attention_*):
# disables pass B's in-place write-back so both variants can be timed
# inside one process.  Production always runs aliased.
import os as _os
_DISABLE_ALIAS = _os.environ.get("DDDPM_ATTN_NO_ALIAS", "") == "1"
# Opt-in to the single-dispatch phased kernel (measured NEGATIVE result,
# kept as proof apparatus: -37% at the 128^2 block despite 33% less HBM
# traffic — per-grid-step overhead and the VMEM stash round-trip cost
# more than the saved x re-read; see BENCH_NOTES "attention ceiling").
# Probes flip the module global before tracing.
_FORCE_ONE_PASS = _os.environ.get("DDDPM_ATTN_ONE_PASS", "") == "1"
# probe hook: pin the batch-group size (None = the measured policy)
_FORCE_GROUP = None
# exp overflow guard; LN-bounded softmax logits never get near this.
# 60 (not 80) so the UNSHIFTED f32 exp-sum also cannot overflow:
# exp(60) ~= 1.1e26, leaving ~3e12 tokens of headroom under f32 max.
K_CLAMP = 60.0


def _layer_norm_f32(x, g, b):
    """Channel LayerNorm, f32 math: (x - mean)/(std + eps) * g + b."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)  # biased
    return (xf - mean) / (jnp.sqrt(var) + LN_EPS) * g + b


def _layer_norm_mxu(x, g, b):
    """In-kernel LayerNorm with the channel reductions on the MXU.

    Lane-axis reductions are the VPU's weak spot (log2(C) shuffle steps
    per tile); dot(x, ones) computes sum(x) on the systolic array
    instead, with f32 accumulation of the exact bf16 inputs.  Variance
    uses the parallel-moments form E[x^2] - E[x]^2 (f32; inputs are
    LN-scale activations, so cancellation is ~1e-7 relative — measured
    one bf16 ulp against the two-pass form on the production path).
    Measured on the 128^2 c128 block at bs 96: 5.96 -> 5.17 ms for the
    whole fused block (scripts/probe_attention_shapes.py session).

    Only pays at C <= 128: at C=256 the ones-matmul runs two systolic
    depth passes per stat (2 x 268 MF/tile) and measures SLOWER than
    the VPU reduce (64^2 c256 block: 2.45 -> 2.72 ms), so wider
    channels use the VPU parallel-moments form instead."""
    n = x.shape[-1]
    xf = x.astype(jnp.float32)
    if n <= 128:
        ones = jnp.ones((n, 128), x.dtype)
        dims = (((1,), (0,)), ((), ()))
        s1 = lax.dot_general(x, ones, dims,
                             preferred_element_type=jnp.float32)[:, :1]
        s2 = lax.dot_general(x * x, ones, dims,
                             preferred_element_type=jnp.float32)[:, :1]
        m1 = s1 / n
        # parallel-moments var can round slightly negative for
        # near-constant rows (x*x is bf16 on the n<=128 path); clamp so
        # sqrt never returns NaN — one free VPU op
        var = jnp.maximum(s2 / n - m1 * m1, 0.0)
    else:
        m1 = xf.mean(axis=-1, keepdims=True)
        var = jnp.maximum(
            (xf * xf).mean(axis=-1, keepdims=True) - m1 * m1, 0.0)
    return (xf - m1) / (jnp.sqrt(var) + LN_EPS) * g + b


def _reference_impl(x, g, b, w_qkv, w_out, b_out, dim_head: int):
    """Pure-JAX reference of the whole block on (B, N, C) tensors."""
    bsz, n, c = x.shape
    hidden = w_out.shape[0]
    h = hidden // dim_head
    ln = _layer_norm_f32(x, g, b).astype(x.dtype)
    qkv = (ln @ w_qkv).reshape(bsz, n, 3, h, dim_head)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    # same K_CLAMP as the fused kernel: softmax(min(k, K)) == the
    # kernel's exp(min(k, K)) / sum(exp(min(k, K))), so forward and
    # custom-VJP backward agree even if a logit ever exceeds the clamp
    k = jnp.minimum(k.astype(jnp.float32), K_CLAMP)
    k = jax.nn.softmax(k, axis=1).astype(x.dtype)
    ctx = jnp.einsum("bnhd,bnhe->bhde", k, v)
    out = jnp.einsum("bhde,bnhd->bnhe", ctx, q)
    out = out.reshape(bsz, n, hidden)
    return x + (out @ w_out + b_out).astype(x.dtype)


def _ctx_kernel(x_ref, g_ref, b_ref, wkv_ref, ctx_ref,
                s_scr, a_scr, *, dim_head, group):
    """Pass A: accumulate A += exp(k)^T v and s += sum exp(k) over token
    tiles; at the last tile emit ctx = blockdiag(A / s).

    The W_eff fold itself happens OUTSIDE in XLA as one batched einsum:
    inside the kernel it would run in the sequential per-batch grid
    tail (~tens of us x batch), measurably slower than a batched XLA
    matmul over all batch elements at once.

    group > 1 processes G batch elements per grid step (only used when
    the whole sample is one token tile): LN + the kv matmul + exp run
    batched over the flattened (G*TN, C) block; only the tiny per-
    sample A-accumulation dots unroll.  This amortizes per-grid-step
    overhead, which dominates small-N blocks (96 one-tile steps at
    32^2: 0.85 ms isolated vs ~0.5 floor).
    """
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    # MXU operand precision follows the input dtype: bf16 inputs (the
    # production UNet path) keep every matmul operand bf16 (an f32 MXU
    # matmul costs multiple passes); f32 inputs stay exact.
    mxu_dtype = x_ref.dtype
    hidden = s_scr.shape[-1]
    tn = x_ref.shape[1]

    @pl.when(j == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)
        a_scr[:] = jnp.zeros_like(a_scr)

    xf = x_ref[...].reshape(group * tn, x_ref.shape[-1])
    ln = _layer_norm_mxu(xf, g_ref[:], b_ref[:])        # (G*TN, C) f32
    ln = ln.astype(mxu_dtype)
    # one (C -> 2*hidden) matmul: wider MXU N-dim than separate k/v
    kv = jnp.dot(ln, wkv_ref[:], preferred_element_type=jnp.float32)
    # exp is computed in f32; p is then rounded to the MXU operand dtype
    # (bf16 on the production path) for the A-accumulation matmul below,
    # while the denominator s stays f32 (benched loss-neutral: 1.7077 vs
    # 1.7075 imgs/s against an all-bf16 exp)
    p = jnp.exp(jnp.minimum(kv[:, :hidden], K_CLAMP))
    pm = p.astype(mxu_dtype)
    vm = kv[:, hidden:].astype(mxu_dtype)
    for gi in range(group):
        sl = slice(gi * tn, (gi + 1) * tn)
        s_scr[gi:gi + 1] += jnp.sum(p[sl], axis=0, keepdims=True)
        a_scr[gi * hidden:(gi + 1) * hidden] += lax.dot_general(
            pm[sl], vm[sl],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == nt - 1)
    def _():
        hd = hidden
        row = lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
        col = lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
        mask = row == col
        for gi in range(group):
            a = a_scr[gi * hidden:(gi + 1) * hidden]
            ctx = a / s_scr[gi:gi + 1].T
            ctx_ref[gi] = jnp.where(mask, ctx, 0.0)


def _out_kernel(x_ref, g_ref, b_ref, weff_ref, bo_ref, y_ref, *, group):
    """Pass B: y = x + LN(x) @ W_eff + b_out — ONE token matmul, since
    associativity collapses the q-projection, context application and
    out-projection: ((ln@Wq) @ ctx) @ Wout == ln @ (Wq @ ctx @ Wout).
    group > 1: LN batches over the flattened block, the per-sample
    W_eff token matmuls unroll."""
    tn = x_ref.shape[1]
    c = x_ref.shape[-1]
    xf = x_ref[...].reshape(group * tn, c)
    ln = _layer_norm_mxu(xf, g_ref[:], b_ref[:]).astype(x_ref.dtype)
    for gi in range(group):
        sl = slice(gi * tn, (gi + 1) * tn)
        y = jnp.dot(ln[sl], weff_ref[gi].astype(x_ref.dtype),
                    preferred_element_type=jnp.float32) + bo_ref[:]
        y_ref[gi] = (xf[sl].astype(jnp.float32) + y).astype(y_ref.dtype)


def _block_kernel_1p(x_ref, g_ref, b_ref, wkv_ref, wq_ref, wout_ref,
                     bo_ref, y_ref, s_scr, a_scr, xs_scr, weff_scr,
                     *, dim_head):
    """Single-dispatch fused block over a PHASED grid (bsz, 2, nt).

    The two-pass design reads x from HBM twice (pass A for the ctx
    accumulation, pass B for the token matmul): 1.2 GB of traffic at
    the 128^2 c128 bs96 block.  Here both phases live in ONE kernel
    and x tiles are stashed in a single-buffered VMEM scratch:

      phase 0, tile j:  LN -> kv -> exp -> accumulate (A, s); stash the
                        raw x tile into xs_scr[j] (VMEM copy).
      phase 1, j == 0:  fold W_eff = Wq @ blockdiag(A/s) @ Wout
                        in-register (small (C,C) matmuls).
      phase 1, tile j:  y = x + LN(x) @ W_eff + b_out from the stashed
                        tile — x is never re-read from HBM, and phase 1
                        is write-only DMA.

    Every grid step stays thin (one tile of work), so the pipeline's
    one-step lookahead keeps DMA and compute overlapped — a resident
    whole-sample output block with the fold in the last step was
    measured 51% SLOWER (the fat final step serializes).  The index
    maps pin x to tile nt-1 during phase 1 and y to tile 0 during
    phase 0, so neither block refetches or flushes mid-sample.

    HBM traffic: read x once + write y once = 804 MB at the 128^2
    block (33% less than two-pass), one dispatch instead of two, and
    no XLA round-trip for the W_eff fold."""
    ph = pl.program_id(1)
    j = pl.program_id(2)
    nt = pl.num_programs(2)
    mxu_dtype = x_ref.dtype
    hidden = s_scr.shape[-1]

    @pl.when((ph == 0) & (j == 0))
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)
        a_scr[:] = jnp.zeros_like(a_scr)

    @pl.when(ph == 0)
    def _():
        x = x_ref[0]                                        # (TN, C)
        ln = _layer_norm_mxu(x, g_ref[:], b_ref[:]).astype(mxu_dtype)
        kv = jnp.dot(ln, wkv_ref[:], preferred_element_type=jnp.float32)
        p = jnp.exp(jnp.minimum(kv[:, :hidden], K_CLAMP))
        s_scr[:] += jnp.sum(p, axis=0, keepdims=True)
        a_scr[:] += lax.dot_general(
            p.astype(mxu_dtype), kv[:, hidden:].astype(mxu_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        xs_scr[j] = x

    @pl.when((ph == 1) & (j == 0))
    def _():
        hd = a_scr.shape[0]
        row = lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
        col = lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
        ctx = jnp.where(row == col, a_scr[:] / s_scr[:].T, 0.0)
        weff_scr[:] = jnp.dot(
            jnp.dot(wq_ref[:].astype(jnp.float32), ctx,
                    preferred_element_type=jnp.float32),
            wout_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32)

    @pl.when(ph == 1)
    def _():
        xc = xs_scr[j]                                      # (TN, C)
        lnc = _layer_norm_mxu(xc, g_ref[:], b_ref[:]).astype(mxu_dtype)
        out = jnp.dot(lnc, weff_scr[:].astype(mxu_dtype),
                      preferred_element_type=jnp.float32) + bo_ref[:]
        y_ref[0] = (xc.astype(jnp.float32) + out).astype(y_ref.dtype)


def _fused_forward_1pass(x, g, b, w_qkv, w_out, b_out, dim_head: int,
                         interpret: bool):
    bsz, n, c = x.shape
    hidden = w_out.shape[0]
    # smaller tiles than two-pass: the whole-sample x stash is VMEM-
    # resident, so the per-tile temporaries must share the 16 MB
    # scoped budget with it
    tn = _pick_tile(n, 4096 if c <= 128 else 2048)
    nt = n // tn

    w_q, w_k, w_v = (w_qkv.reshape(c, 3, hidden)[:, i] for i in range(3))
    w_kv = jnp.concatenate([w_k, w_v], axis=1)          # (C, 2*hidden)
    g2, b2, bo2 = (t.reshape(1, -1) for t in (g, b, b_out))

    # phase 1 pins x to the tile it already holds (no refetch, no
    # dummy traffic); phase 0 pins y to block 0, which is first
    # written at (ph=1, j=0) before its index ever changes
    x_spec = pl.BlockSpec(
        (1, tn, c), lambda i, ph, j: (i, (1 - ph) * j + ph * (nt - 1), 0),
        memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, tn, c), lambda i, ph, j: (i, ph * j, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = lambda d: pl.BlockSpec((1, d), lambda i, ph, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    mat_spec = lambda r, s: pl.BlockSpec((r, s), lambda i, ph, j: (0, 0),
                                         memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        partial(_block_kernel_1p, dim_head=dim_head),
        grid=(bsz, 2, nt),
        in_specs=[x_spec, vec_spec(c), vec_spec(c),
                  mat_spec(c, 2 * hidden), mat_spec(c, hidden),
                  mat_spec(hidden, c), vec_spec(c)],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, hidden), jnp.float32),
            pltpu.VMEM((hidden, hidden), jnp.float32),
            pltpu.VMEM((nt, tn, c), x.dtype),
            pltpu.VMEM((c, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, g2, b2, w_kv, w_q, w_out, bo2)
    return y


def _pick_tile(n: int, target: int = 4096) -> int:
    """Token-tile size: bigger tiles amortize per-grid-step overhead
    (the 128^2-latent block runs 2 x bsz x N/tile sequential grid
    steps); 4096 keeps pass A's f32 temporaries ~10 MB of VMEM
    (benched 1.7021 -> 1.7075 imgs/s over 2048 on the headline chain).
    c<=128 blocks take 8192 (isolated 5.01 -> 4.87 ms at the 128^2
    shape; 16384 exceeds the scoped-VMEM limit); at c=256 the f32 kv
    temporary alone would be 16 MB at 8192, so those stay at 4096."""
    tile = min(n, target)
    while n % tile:
        tile //= 2
    return max(tile, 1)


# below this token count the grid/dispatch overhead of two pallas
# passes exceeds what fusion saves: at 16^2 (N=256, bs 96) the XLA
# einsum path measures 0.68 ms vs 0.79 fused
# (scripts/probe_attention_shapes.py); at 32^2 (N=1024) fused wins.
XLA_PATH_MAX_TOKENS = 512


def _pick_group(bsz: int, n: int, nt: int) -> int:
    """Batch-group factor for single-tile (nt == 1) blocks: the largest
    of 8/4/2 that divides the batch and keeps <= 4096 tokens per grid
    step.  default=1 covers both multi-tile blocks and single-tile
    blocks already past the cap (e.g. 4096 < n <= 8192 at c <= 128,
    where _pick_tile returns tn == n) — group=1 is the ungrouped grid."""
    if nt != 1:
        return 1
    return max((gg for gg in (8, 4, 2)
                if bsz % gg == 0 and gg * n <= 4096), default=1)


def _fused_forward(x, g, b, w_qkv, w_out, b_out, dim_head: int,
                   interpret: bool = False):
    interpret = interpret or jax.default_backend() == "cpu"
    bsz, n, c = x.shape
    if n <= XLA_PATH_MAX_TOKENS and not interpret:
        return _reference_impl(x, g, b, w_qkv, w_out, b_out, dim_head)
    if _FORCE_ONE_PASS:
        return _fused_forward_1pass(x, g, b, w_qkv, w_out, b_out,
                                    dim_head, interpret)
    hidden = w_out.shape[0]
    target = 8192 if c <= 128 else 4096
    tn = _pick_tile(n, target)
    nt = n // tn
    # batch-group small single-tile blocks so each grid step carries up
    # to 4096 tokens: per-grid-step overhead dominates tiny-N blocks.
    # Measured (scripts/probe_attention_grouped.py, bs 96): 32^2 c256
    # 0.622 -> 0.563 ms at g=4; at n=4096 grouping stops paying
    # (64^2 c128: g1 1.090 vs g2 1.115), hence the 4096-token cap.
    group = _pick_group(bsz, n, nt)
    if _FORCE_GROUP is not None and bsz % _FORCE_GROUP == 0 and nt == 1:
        group = _FORCE_GROUP    # probe hook (scripts/probe_attention_*)

    # qkv weight columns ordered (3, heads, d) -> q | k | v slabs
    w_q, w_k, w_v = (w_qkv.reshape(c, 3, hidden)[:, i] for i in range(3))
    w_kv = jnp.concatenate([w_k, w_v], axis=1)          # (C, 2*hidden)

    # vectors ship as (1, C) — TPU block shapes want >= 2 dims
    g2, b2, bo2 = (t.reshape(1, -1) for t in (g, b, b_out))

    x_spec = pl.BlockSpec((group, tn, c), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = lambda d: pl.BlockSpec((1, d), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    mat_spec = lambda r, s: pl.BlockSpec((r, s), lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM)
    ctx_spec = pl.BlockSpec((group, hidden, hidden),
                            lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    weff_spec = pl.BlockSpec((group, c, c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    ctx = pl.pallas_call(
        partial(_ctx_kernel, dim_head=dim_head, group=group),
        grid=(bsz // group, nt),
        in_specs=[x_spec, vec_spec(c), vec_spec(c),
                  mat_spec(c, 2 * hidden)],
        out_specs=ctx_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hidden, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((group, hidden), jnp.float32),
            pltpu.VMEM((group * hidden, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(x, g2, b2, w_kv)

    # fold the q-projection, per-batch context, and out-projection into
    # one effective (C, C) weight per batch element — a batched XLA
    # einsum over all batch elements at once (a few MFLOPs)
    w_eff = jnp.einsum("ch,bhg,gf->bcf", w_q.astype(jnp.float32), ctx,
                       w_out.astype(jnp.float32)).astype(x.dtype)

    # input_output_aliases: pass B writes y in-place into x's buffer
    # (tile j is read before it is written; x is dead after this call).
    # Measured (scripts/probe_attention_writeback.py): on this chip a
    # read-one-buffer/write-another stream tops out at ~265 GB/s while
    # in-place read+write reaches ~430 GB/s (the same rate XLA's own
    # elementwise ops get) — aliasing alone cuts the stripped pass-B
    # DMA from 3.05 to 1.87 ms at the 128^2 c128 block.  When x is
    # still live afterwards (the training path saves it for the VJP),
    # XLA inserts the copy automatically, so this is sampling-path free
    # and training-path neutral.
    return pl.pallas_call(
        partial(_out_kernel, group=group),
        grid=(bsz // group, nt),
        in_specs=[x_spec, vec_spec(c), vec_spec(c), weff_spec, vec_spec(c)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        input_output_aliases={} if _DISABLE_ALIAS else {0: 0},
        interpret=interpret,
    )(x, g2, b2, w_eff, bo2)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def attention_block(x, g, b, w_qkv, w_out, b_out, dim_head: int = 32,
                    interpret: bool = False):
    """Fused residual pre-norm linear-attention block.

    x: (B, N, C); g, b: (C,) LayerNorm params; w_qkv: (C, 3*hidden);
    w_out: (hidden, C); b_out: (C,).
    """
    return _fused_forward(x, g, b, w_qkv, w_out, b_out, dim_head, interpret)


def _fwd(x, g, b, w_qkv, w_out, b_out, dim_head, interpret):
    out = _fused_forward(x, g, b, w_qkv, w_out, b_out, dim_head, interpret)
    return out, (x, g, b, w_qkv, w_out, b_out)


def _bwd(dim_head, interpret, res, grad):
    x, g, b, w_qkv, w_out, b_out = res
    _, vjp = jax.vjp(partial(_reference_impl, dim_head=dim_head),
                     x, g, b, w_qkv, w_out, b_out)
    return vjp(grad)


attention_block.defvjp(_fwd, _bwd)
