"""Fused linear-attention Pallas TPU kernel.

The UNet applies linear attention at every resolution
(softmax over the key token axis, then two (tokens x dim) contractions;
see models/blocks.py LinearAttention).  Unfused, XLA materializes the
softmaxed keys and the (d x e) context in HBM between ops; this kernel
keeps the whole per-(batch, head) computation VMEM-resident:

    k_n   = softmax_n(k)          (column-wise over tokens)
    ctx   = k_n^T @ v             (d x d, MXU)
    out   = q @ ctx               (N x d, MXU)

Grid: one program per (batch * head).  Token/dim tiles of (N <= 4096,
d = 32) fit easily in VMEM (3 x N*d*4 bytes + d^2).

Gradients: the op is wrapped in jax.custom_vjp whose backward re-derives
from the identical pure-JAX computation, so training through the fused
op is exact.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_impl(q, k, v):
    """Pure-JAX reference: identical math, used for VJP and testing.

    q, k, v: (BH, N, D) — batch*heads major.
    """
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1)
    ctx = jnp.einsum("bnd,bne->bde", k, v.astype(jnp.float32))
    out = jnp.einsum("bde,bnd->bne", ctx, q.astype(jnp.float32))
    return out.astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)   # (N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    # softmax over the token axis (axis 0), numerically stable
    m = jnp.max(k, axis=0, keepdims=True)
    e = jnp.exp(k - m)
    kn = e / jnp.sum(e, axis=0, keepdims=True)

    ctx = jnp.dot(kn.T, v, preferred_element_type=jnp.float32)   # (D, D)
    out = jnp.dot(q, ctx, preferred_element_type=jnp.float32)    # (N, D)
    o_ref[0] = out.astype(o_ref.dtype)


def _fused_forward(q, k, v, interpret: bool = False):
    bh, n, d = q.shape
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def linear_attention(q, k, v, interpret: bool = False):
    """Fused linear attention over (BH, N, D) tensors."""
    return _fused_forward(q, k, v, interpret)


def _fwd(q, k, v, interpret):
    return _fused_forward(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference_impl, q, k, v)
    return vjp(g)


linear_attention.defvjp(_fwd, _bwd)
