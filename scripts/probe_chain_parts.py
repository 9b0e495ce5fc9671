"""Cost of non-UNet pieces of the sampling chain at bench batch size:
the ConvTranspose upsample layers and the per-step noise generation
(threefry vs TPU hardware RBG).  Scan-in-jit timing (see
probe_unet_split.py for why).

    python scripts/probe_chain_parts.py [--bs 96]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, scan_len=30):
    @jax.jit
    def chain(*args):
        def body(c, _):
            return fn(*((c,) + args[1:])), None
        y, _ = lax.scan(body, args[0], None, length=scan_len)
        return jnp.sum(y)

    _ = float(chain(*args))
    start = time.perf_counter()
    _ = float(chain(*args))
    return (time.perf_counter() - start) / scan_len


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=96)
    args = p.parse_args()
    bs = args.bs
    key = jax.random.PRNGKey(0)

    # --- ConvTranspose layers as they appear in the 128^2-latent UNet
    for (h, c) in [(64, 128), (32, 256), (16, 256)]:
        x = jax.random.normal(key, (bs, h, h, c), jnp.bfloat16)
        w = (jax.random.normal(key, (4, 4, c, c), jnp.bfloat16) * 0.02)

        def convt(x, w):
            y = lax.conv_transpose(x, w, (2, 2), "SAME",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # halve spatial back so the scan carry shape is preserved
            return y[:, ::2, ::2]

        dt = timed(convt, x, w)
        dil_fl = 2 * bs * (2 * h) ** 2 * 16 * c * c
        use_fl = dil_fl / 4
        print(f"convT {h}->{2*h} c{c}: {dt*1e3:7.3f} ms  "
              f"dilated-rate {dil_fl/dt/1e12:6.1f} TF  "
              f"useful-rate {use_fl/dt/1e12:6.1f} TF", flush=True)

    # --- per-step noise generation at the latent shape
    shape = (bs, 128, 128, 8)
    x = jnp.zeros(shape)

    def noise_threefry(x, key):
        return x + jax.random.normal(jax.random.fold_in(key, 7), shape)

    dt = timed(noise_threefry, x, key)
    print(f"threefry normal {shape}: {dt*1e3:7.3f} ms", flush=True)

    rbg_key = jax.random.key(0, impl="rbg")

    def noise_rbg(x, key):
        return x + jax.random.normal(jax.random.fold_in(key, 7), shape)

    dt = timed(noise_rbg, x, rbg_key)
    print(f"rbg      normal {shape}: {dt*1e3:7.3f} ms", flush=True)

    # --- full p_sample elementwise math minus the UNet
    from dddpm_tpu.models.schedule import DiffusionSchedule, gather
    sched = DiffusionSchedule.create("linear", 1000)

    def p_math(x, key):
        t = jnp.full((bs,), 500, jnp.int32)
        eps_hat = x * 0.1  # stand-in for the UNet output
        xr = (gather(sched.sqrt_recip_alphas_cumprod, t, 4) * x
              - gather(sched.sqrt_recipm1_alphas_cumprod, t, 4) * eps_hat)
        xr = jnp.clip(xr, -1.0, 1.0)
        mean = (gather(sched.posterior_mean_coef1, t, 4) * xr
                + gather(sched.posterior_mean_coef2, t, 4) * x)
        logv = gather(sched.posterior_log_variance_clipped, t, 4)
        eps = jax.random.normal(jax.random.fold_in(key, 3), shape)
        return mean + jnp.exp(0.5 * logv) * eps

    dt = timed(p_math, x, key)
    print(f"p_sample math (threefry): {dt*1e3:7.3f} ms", flush=True)
    dt = timed(p_math, x, rbg_key)
    print(f"p_sample math (rbg):      {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
