"""Hardware numerics check: full sampling chain with the fused Pallas
attention vs the einsum path, same params and RNG.

bf16 compute means bitwise equality is not expected; the check is that
the two chains stay statistically identical (same mean/std, small
per-pixel divergence after T steps).

    python scripts/verify_fused_sampling.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from dddpm_tpu.models.schedule import DiffusionSchedule
    from dddpm_tpu.models.unet import Unet
    from dddpm_tpu.models.ddpm import GaussianDiffusion

    T, size, ch = 50, 32, 8
    sched = DiffusionSchedule.create("cosine", T)

    def make(use_pallas):
        net = Unet(dim=64, in_channels=ch, dim_mults=(1, 2, 2),
                   dropout=0.0, dtype=jnp.bfloat16, use_pallas=use_pallas)

        def eps_fn(params, x_t, t, rng, train):
            return net.apply(params, x_t, t)

        return net, GaussianDiffusion(sched, eps_fn, (size, size, ch))

    net_ref, proc_ref = make(False)
    _, proc_pl = make(True)
    x0 = jnp.zeros((1, size, size, ch))
    params = net_ref.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))

    rng = jax.random.PRNGKey(7)
    s_ref = np.asarray(jax.jit(
        lambda p, r: proc_ref.sample(p, r, 4))(params, rng))
    s_pl = np.asarray(jax.jit(
        lambda p, r: proc_pl.sample(p, r, 4))(params, rng))

    diff = np.abs(s_ref - s_pl)
    print(f"einsum chain: mean {s_ref.mean():+.4f} std {s_ref.std():.4f}")
    print(f"pallas chain: mean {s_pl.mean():+.4f} std {s_pl.std():.4f}")
    print(f"divergence after {T} steps: max {diff.max():.4f} "
          f"mean {diff.mean():.5f}")
    assert abs(s_ref.mean() - s_pl.mean()) < 0.02
    assert abs(s_ref.std() - s_pl.std()) < 0.02
    assert diff.mean() < 0.05, "chains diverged beyond bf16 noise"
    print("OK: fused sampling chain statistically matches einsum path")


if __name__ == "__main__":
    main()
