"""Same-session A/B: full p_sample chain step vs bare UNet eval at the
headline config (x2 latent 128^2 c8, bs 96, bf16 fused attention).
The difference is the per-step non-UNet sampler math: schedule gathers,
predict-x0 + clip + posterior mean/var, the noise draw, and the masked
update.  Variants isolate the RNG draw (threefry vs rbg vs precomputed)
and the elementwise chain.

    python scripts/probe_sampler_math.py [--bs 96] [--iters 20]
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from _probe_util import setup_cache, timed_call  # noqa: E402

setup_cache()


def timed(chain, args, iters):
    return timed_call(chain, args, n=iters) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=96)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    bs, iters = args.bs, args.iters

    from bench import _sample_config
    from dddpm_tpu.models.factory import build_model

    # the exact model bench.py benchmarks — imported, not copied
    config = _sample_config(bs)
    net, proc, init_fn, config = build_model(config)
    params = init_fn(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (bs, 128, 128, 8),
                          jnp.float32)
    ts = jnp.arange(iters - 1, -1, -1, dtype=jnp.int32)

    # A: the real chain step (rbg noise, as bench.py runs it)
    rng_rbg = jax.random.key(0, impl="rbg")
    rng_tf = jax.random.PRNGKey(0)

    def chain_full(rng):
        @jax.jit
        def run(params, z, rng):
            return jnp.sum(
                proc.p_sample_chain(params, rng, z, ts).astype(jnp.float32))
        return lambda p, zz: run(p, zz, rng)

    # B: bare UNet evals only (carry the latent through the net)
    @jax.jit
    def chain_unet(params, z):
        def body(c, t):
            t_b = jnp.full((bs,), t, jnp.int32)
            eps = proc.eps_fn(params, c, t_b, None, False)
            return eps.astype(jnp.float32), None
        y, _ = lax.scan(body, z, ts)
        return jnp.sum(y)

    # C: chain with noise precomputed (isolates the per-step RNG draw)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, bs, 128, 128, 8),
                              jnp.float32)

    @jax.jit
    def chain_pre(params, z):
        def body(c, t):
            t_b = jnp.full((bs,), t, jnp.int32)
            mean, _, logvar = proc.p_mean_variance(params, c, t_b)
            nz = (t_b != 0).astype(c.dtype).reshape((bs, 1, 1, 1))
            c = mean + nz * jnp.exp(0.5 * logvar) * noise[0]
            return c, None
        y, _ = lax.scan(body, z, ts)
        return jnp.sum(y)

    a_rbg = timed(chain_full(rng_rbg), (params, z), iters)
    a_tf = timed(chain_full(rng_tf), (params, z), iters)
    b = timed(chain_unet, (params, z), iters)
    c = timed(chain_pre, (params, z), iters)
    print(f"chain step (rbg noise)      {a_rbg:7.2f} ms")
    print(f"chain step (threefry noise) {a_tf:7.2f} ms")
    print(f"bare UNet eval              {b:7.2f} ms")
    print(f"chain step, noise precomp   {c:7.2f} ms")
    print(f"sampler math total (rbg)    {a_rbg - b:7.2f} ms"
          f"   [rng draw {a_rbg - c:5.2f}, elementwise {c - b:5.2f}]")


if __name__ == "__main__":
    main()
