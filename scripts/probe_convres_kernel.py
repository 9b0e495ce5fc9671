"""Fused ConvResBlock kernel vs the XLA block: fwd and grad timings.

    python scripts/probe_convres_kernel.py [--bs 32] [--res 256]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(make_chain, *args, scan_len=20):
    chain = jax.jit(make_chain(scan_len))
    _ = float(chain(*args))
    best = np.inf
    for _ in range(2):
        start = time.perf_counter()
        _ = float(chain(*args))
        best = min(best, (time.perf_counter() - start) / scan_len)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--res", type=int, default=256)
    args = p.parse_args()

    from dddpm_tpu.ops.pallas.convres import (
        _reference_impl, fused_convres_block)

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

    for name, fn in (("xla", _reference_impl), ("fused", fused_convres_block)):
        def fwd_chain(n, fn=fn):
            def chain(x, *ws):
                def body(c, _):
                    return fn(c, *ws, True).astype(c.dtype), None
                y, _ = lax.scan(body, x, None, length=n)
                return jnp.sum(y.astype(jnp.float32))
            return chain

        dt = timed(fwd_chain, x, *ws)
        print(f"{name}-fwd  {dt*1e3:7.3f} ms", flush=True)

        def grad_chain(n, fn=fn):
            def loss(ws_, c):
                return jnp.sum(fn(c, *ws_, True).astype(jnp.float32) ** 2) * 1e-6

            def chain(x, *ws_):
                def body(c, _):
                    v, g = jax.value_and_grad(loss, argnums=(0, 1))(ws_, c)
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(g))
                    return c * (1.0 + 1e-12 * v.astype(c.dtype)), s
                y, vs = lax.scan(body, x, None, length=n)
                return jnp.sum(y.astype(jnp.float32)) + jnp.sum(vs)
            return chain

        dt = timed(grad_chain, x, *ws)
        print(f"{name}-grad {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
