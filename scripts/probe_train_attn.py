"""How much of the dDDPM x3 256^2 train step is the attention block?

Decides whether a hand-written fused BACKWARD kernel for the attention
block is worth building (VERDICT r1 item 6): the fused forward's
custom_vjp currently re-derives gradients through the pure-JAX
reference implementation.

Variants:
  pallas  — fused forward, reference-vjp backward (production today)
  einsum  — unfused forward and backward (flax module path)
  none    — attention blocks removed entirely (upper bound on ANY
            attention work incl. a perfect fused forward+backward)

    python scripts/probe_train_attn.py [--variant pallas|einsum|none]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="pallas",
                   choices=["pallas", "einsum", "none"])
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import dddpm_tpu.models.blocks as B

    if args.variant == "none":
        def identity_attn(self, x):
            return x
        B.PreNormLinearAttention.__call__ = nn.compact(identity_attn)

    from dddpm_tpu.models.factory import build_model
    from dddpm_tpu.train.state import (
        create_optimizer, create_train_state, make_train_step)

    config = {
        "model": "dddpm", "dataset": "celeba_hq", "image_size": 256,
        "batch_size": args.bs, "T": 1000, "loss_type": "simple",
        "beta_schedule": "linear", "loss_flat": "sum",
        "unet_chan": 128, "unet_dims": (1, 2, 2, 2), "unet_dropout": 0.1,
        "unet_in": 8, "n_downsamples": 3,
        "d_mode": "convolutional_res", "u_mode": "convolutional_res",
        "d_dropout": 0, "d_chans": 64, "d_n_blocks": 3, "u_n_blocks": 3,
        "ae_loss": True, "t_rec_max": 100, "force_latent": True,
        "compute_dtype": "bfloat16", "lr": 2e-4,
        "use_pallas_attention": args.variant == "pallas",
    }
    net, process, init_fn, config = build_model(config)
    tx = create_optimizer(config["lr"])
    state = create_train_state(config, init_fn, jax.random.PRNGKey(0), tx)
    step_fn = jax.jit(make_train_step(process, tx, grad_accum=2,
                                      ema_decay=0.995), donate_argnums=0)
    batch = jax.random.uniform(jax.random.PRNGKey(1),
                               (2, args.bs, 256, 256, 3),
                               minval=-1.0, maxval=1.0)
    state, metrics = step_fn(state, batch)
    _ = float(metrics["train_obj"])
    start = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["train_obj"])
    dt = (time.perf_counter() - start) / args.iters
    print(f"{args.variant:8s} train step {dt*1e3:8.2f} ms "
          f"({2*args.bs/dt:.1f} imgs/sec, bs {args.bs} x2 accum)",
          flush=True)


if __name__ == "__main__":
    main()
