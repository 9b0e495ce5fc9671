"""Decompose the dDDPM x3 256^2 train-step's resampler cost.

The x3 step is ~94% down/upsampler (STATUS r2).  This probe times, the
reliable way (scan inside one jit, scalar fetch):

  block-fwd      one plain ConvResBlock @256^2 c64 bs32, forward
  block-grad     same block, value_and_grad (what training pays)
  block-nomish   block-grad with mish -> identity (transcendental cost)
  block-gemm     the block's 4 convs as bare GEMMs (MXU structural bound)
  down-grad      full x3 downsampler, value_and_grad
  up-grad        full x3 upsampler, value_and_grad

    python scripts/probe_resampler.py [--bs 32]
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
    args = p.parse_args()

    import dddpm_tpu.ops.math as dmath
    from dddpm_tpu.models.resample import ConvResBlock, ConvResNet

    bs = args.bs
    x = jax.random.normal(jax.random.PRNGKey(0), (bs, 256, 256, 64),
                          jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(1), (bs, 256, 256, 3),
                            jnp.bfloat16)

    block = ConvResBlock(32, 64, 64, residual=True, dtype=jnp.bfloat16)
    params = block.init(jax.random.PRNGKey(2), x)

    def fwd_chain(n):
        def chain(params, x):
            def body(c, _):
                return block.apply(params, c), None
            y, _ = lax.scan(body, x, None, length=n)
            return jnp.sum(y.astype(jnp.float32))
        return chain

    dt = timed(fwd_chain, params, x)
    print(f"block-fwd    {dt*1e3:7.3f} ms", flush=True)

    def grad_chain(n):
        def loss(p, c):
            return jnp.sum(block.apply(p, c).astype(jnp.float32) ** 2) * 1e-6

        def chain(params, x):
            def body(c, _):
                v, g = jax.value_and_grad(loss)(params, c)
                leaves = [jnp.sum(l.astype(jnp.float32)) for l in
                          jax.tree.leaves(g)]
                return c * (1.0 + 1e-12 * v.astype(c.dtype)), sum(leaves)
            y, vs = lax.scan(body, x, None, length=n)
            return jnp.sum(y.astype(jnp.float32)) + jnp.sum(vs)
        return chain

    dt_g = timed(grad_chain, params, x)
    print(f"block-grad   {dt_g*1e3:7.3f} ms", flush=True)

    # mish -> identity: upper bound of any mish optimization
    orig_mish = dmath.mish
    try:
        import dddpm_tpu.models.resample as rs
        rs.mish = lambda v: v
        block2 = ConvResBlock(32, 64, 64, residual=True, dtype=jnp.bfloat16)
        params2 = block2.init(jax.random.PRNGKey(2), x)

        def grad_chain2(n):
            def loss(p, c):
                return jnp.sum(block2.apply(p, c).astype(jnp.float32) ** 2) * 1e-6

            def chain(params, x):
                def body(c, _):
                    v, g = jax.value_and_grad(loss)(params, c)
                    leaves = [jnp.sum(l.astype(jnp.float32)) for l in
                              jax.tree.leaves(g)]
                    return c * (1.0 + 1e-12 * v.astype(c.dtype)), sum(leaves)
                y, vs = lax.scan(body, x, None, length=n)
                return jnp.sum(y.astype(jnp.float32)) + jnp.sum(vs)
            return chain

        dt_nm = timed(grad_chain2, params2, x)
        print(f"block-nomish {dt_nm*1e3:7.3f} ms "
              f"(mish cost {1e3*(dt_g-dt_nm):.3f})", flush=True)
    finally:
        rs.mish = orig_mish

    # The block's MXU work as bare matmuls, shifted-matmul form (each
    # 3x3 conv = 9 accumulated (m,32)@(32,32) dots, no im2col tensor):
    # the structural bound any conv implementation of this block obeys.
    m = bs * 256 * 256
    w1 = jax.random.normal(jax.random.PRNGKey(10), (64, 32), jnp.bfloat16) * 0.05
    w33 = jax.random.normal(jax.random.PRNGKey(11), (2, 9, 32, 32),
                            jnp.bfloat16) * 0.05
    w4 = jax.random.normal(jax.random.PRNGKey(12), (32, 64), jnp.bfloat16) * 0.05
    a0 = jax.random.normal(jax.random.PRNGKey(9), (m, 64), jnp.bfloat16)

    def gemm_chain(n):
        def chain(a0, w1, w33, w4):
            def body(c, _):
                h = jnp.dot(c, w1, preferred_element_type=jnp.float32
                            ).astype(c.dtype)
                for j in range(2):
                    acc = jnp.zeros((m, 32), jnp.float32)
                    for i in range(9):
                        acc += jnp.dot(h, w33[j, i],
                                       preferred_element_type=jnp.float32)
                    h = acc.astype(c.dtype)
                h = jnp.dot(h, w4, preferred_element_type=jnp.float32
                            ).astype(c.dtype)
                return c + h, None
            y, _ = lax.scan(body, a0, None, length=n)
            return jnp.sum(y.astype(jnp.float32))
        return chain

    dt_mm = timed(gemm_chain, a0, w1, w33, w4)
    flops = 2 * m * (64 * 32 + 9 * 32 * 32 * 2 + 32 * 64)
    print(f"block-gemm   {dt_mm*1e3:7.3f} ms ({flops/dt_mm/1e12:.1f} TF fwd "
          "equiv; x3 for fwd+bwd)", flush=True)

    # full resamplers under grad
    down = ConvResNet(64, 3, 8, n_downsamples=3, upsample=False,
                      n_blocks=3, dtype=jnp.bfloat16)
    dparams = down.init(jax.random.PRNGKey(3), img)
    up = ConvResNet(64, 8, 3, n_downsamples=3, upsample=True,
                    n_blocks=3, dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(4), (bs, 32, 32, 8),
                          jnp.bfloat16)
    uparams = up.init(jax.random.PRNGKey(5), z)

    for name, mod, prm, inp in (("down-grad", down, dparams, img),
                                ("up-grad", up, uparams, z)):
        def gchain(n, mod=mod):
            def loss(p, c):
                return jnp.sum(mod.apply(p, c).astype(jnp.float32) ** 2) * 1e-6

            def chain(prm, inp):
                def body(c, _):
                    v, g = jax.value_and_grad(loss)(prm, c)
                    leaves = [jnp.sum(l.astype(jnp.float32)) for l in
                              jax.tree.leaves(g)]
                    return c * (1.0 + 1e-12 * v.astype(c.dtype)), sum(leaves)
                y, vs = lax.scan(body, inp, None, length=n)
                return jnp.sum(y.astype(jnp.float32)) + jnp.sum(vs)
            return chain

        dtr = timed(gchain, prm, inp, scan_len=10)
        print(f"{name:12s} {dtr*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
