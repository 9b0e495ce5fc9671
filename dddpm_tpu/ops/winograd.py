"""Winograd F(2x2, 3x3) transforms for stride-1 'SAME' 3x3 convolution.

Lavin & Gray's minimal-filtering algorithm: each 2x2 output tile is

    Y = A^T [ (G g G^T) elemwise (B^T d B) ] A

with d the overlapping 4x4 input tile.  MAC count per output pixel
drops from 9*Cin to 4*Cin (2.25x) — the same trick cuDNN applies to
the reference's 3x3 convs on its GPU baseline.  The transform matrices
are exact in f32 (entries 1, +-0.5), so this is the SAME convolution up
to floating-point rounding, not an approximation.

This module holds the pure-XLA tiling reference (used for equivalence
tests and as the CPU fallback); the production TPU kernel lives in
ops/pallas/winograd.py and keeps the transformed tiles in VMEM.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# B^T: input transform; G: filter transform; A^T: output transform
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (4, 4, Cin, Cout): U = G g G^T per channel."""
    wf = w.astype(jnp.float32)
    u = jnp.einsum("ij,jkcf->ikcf", jnp.asarray(G), wf)
    return jnp.einsum("ikcf,lk->ilcf", u, jnp.asarray(G))


def conv3x3_winograd_ref(x: jnp.ndarray, w: jnp.ndarray,
                         b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pure-XLA Winograd conv (SAME padding), for tests / CPU.

    x: (B, H, W, Cin) with H, W even; w: (3, 3, Cin, Cout).
    """
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert h % 2 == 0 and wd % 2 == 0, (h, wd)

    u = transform_weights(w)                          # (4,4,Cin,Cout)
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    # overlapping 4x4 tiles with stride 2: tile (m, n) covers padded
    # rows 2m..2m+3 = image rows 2m-1..2m+2
    th, tw = h // 2, wd // 2
    d = jnp.stack([xp[:, i:i + 2 * th:2] for i in range(4)], axis=1)
    d = jnp.stack([d[:, :, :, j:j + 2 * tw:2] for j in range(4)], axis=2)
    # d: (B, 4, 4, th, tw, Cin)
    v = jnp.einsum("ij,bjkmnc->bikmnc", jnp.asarray(BT), d)
    v = jnp.einsum("bikmnc,lk->bilmnc", v, jnp.asarray(BT))
    m = jnp.einsum("bijmnc,ijcf->bijmnf", v, u)
    y = jnp.einsum("pi,bijmnf->bpjmnf", jnp.asarray(AT), m)
    y = jnp.einsum("bpjmnf,qj->bpqmnf", y, jnp.asarray(AT))
    # y: (B, 2, 2, th, tw, Cout) -> interleave to (B, H, W, Cout)
    y = y.transpose(0, 3, 1, 4, 2, 5).reshape(bsz, h, wd, cout)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)
