"""Training-dynamics parity check vs the torch reference.

Both frameworks build the same UNet config with their own native
random init and compute the DDPM 'simple' loss (sum-flattened) on the
SAME input batch and timesteps.  If the architectures and init
distributions match (SURVEY.md §7 hard part (c)), the initial losses
agree within sampling noise — this validates comparability of training
dynamics without needing bit-identical weights.

Reads the reference UNet from /root/reference via an import shim (the
reference's own package imports torchvision, absent here).  Read-only.

    python scripts/compare_init_loss.py [--seeds 3]
"""
import argparse
import importlib.util
import sys
import types

sys.path.insert(0, ".")

import numpy as np

REF = "/root/reference"


def load_reference_unet():
    import torch  # noqa

    mu = types.ModuleType("models.utils")
    mu.exists = lambda x: x is not None
    m = types.ModuleType("models")
    mun = types.ModuleType("models.unet")
    sys.modules.setdefault("models", m)
    sys.modules.setdefault("models.unet", mun)
    sys.modules["models.utils"] = mu

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("models.unet.blocks", f"{REF}/models/unet/blocks.py")
    unet = load("models.unet.unet", f"{REF}/models/unet/unet.py")
    return unet.Unet


def torch_loss(seed, x_nhwc, t, eps_nhwc, coefs):
    import torch

    torch.manual_seed(seed)
    Unet = load_reference_unet()
    net = Unet({"unet_chan": 64, "unet_in": 3, "unet_dims": (1, 2, 2),
                "unet_dropout": 0.0})
    net.eval()
    x = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
    eps = torch.from_numpy(eps_nhwc.transpose(0, 3, 1, 2))
    sa, so = coefs
    sa = torch.from_numpy(sa)[:, None, None, None]
    so = torch.from_numpy(so)[:, None, None, None]
    x_t = sa * x + so * eps
    with torch.no_grad():
        eps_hat = net(x_t, torch.from_numpy(t))
    per = ((eps - eps_hat) ** 2).flatten(1).sum(1)
    return float(per.mean())


def jax_loss(seed, x_nhwc, t, eps_nhwc, coefs):
    import jax
    import jax.numpy as jnp
    from dddpm_tpu.models.unet import Unet

    net = Unet(dim=64, in_channels=3, dim_mults=(1, 2, 2), dropout=0.0)
    params = net.init(jax.random.PRNGKey(seed), jnp.asarray(x_nhwc),
                      jnp.asarray(t))
    sa, so = coefs
    x_t = (sa[:, None, None, None] * x_nhwc
           + so[:, None, None, None] * eps_nhwc)
    eps_hat = np.asarray(net.apply(params, jnp.asarray(x_t), jnp.asarray(t)))
    per = ((eps_nhwc - eps_hat) ** 2).reshape(len(x_nhwc), -1).sum(1)
    return float(per.mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    args = p.parse_args()

    from dddpm_tpu.models.schedule import DiffusionSchedule

    rng = np.random.RandomState(0)
    B, S = 16, 32
    x = rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32)
    eps = rng.randn(B, S, S, 3).astype(np.float32)
    t = rng.randint(0, 1000, B).astype(np.int64)

    sched = DiffusionSchedule.create("linear", 1000)
    coefs = (np.asarray(sched.sqrt_alphas_cumprod)[t].astype(np.float32),
             np.asarray(sched.sqrt_one_minus_alphas_cumprod)[t].astype(
                 np.float32))

    torch_losses = [torch_loss(s, x, t, eps, coefs) for s in range(args.seeds)]
    jax_losses = [jax_loss(s, x, t, eps, coefs) for s in range(args.seeds)]
    tm, jm = np.mean(torch_losses), np.mean(jax_losses)
    print(f"torch reference init loss: {torch_losses} (mean {tm:.1f})")
    print(f"dddpm_tpu       init loss: {jax_losses} (mean {jm:.1f})")
    ratio = jm / tm
    print(f"ratio {ratio:.3f}")
    assert 0.8 < ratio < 1.25, "init loss distributions diverge"
    print("OK: initial training dynamics comparable")


if __name__ == "__main__":
    main()
