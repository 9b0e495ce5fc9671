"""Model factory: build (flax module, diffusion process) from a config.

Mirrors the reference's setup_trainer wiring
(/root/reference/trainers/wrapper.py:10-49): plain DDPM gets
unet_in=color_channels; dDDPM wraps the UNet with down/up samplers and
runs the chain in latent space; the autoencoder variant is selected by
config['ae_loss'].
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from dddpm_tpu.data.datasets import get_color_channels
from dddpm_tpu.models.ddpm import GaussianDiffusion
from dddpm_tpu.models.dddpm import (
    DownsampleDiffusion,
    DownsampleDiffusionAutoencoder,
)
from dddpm_tpu.models.resample import get_downsampling, get_upsampling
from dddpm_tpu.models.schedule import DiffusionSchedule
from dddpm_tpu.models.unet import Unet, resolve_use_pallas


class DDDPMNet(nn.Module):
    """Composite net for dDDPM: UNet eps-predictor + down/up samplers.

    Multi-method module: call sites use apply(..., method='eps'/'down'/'up').
    __call__ exists only so init() touches every submodule.
    """

    config: dict

    def setup(self):
        cfg = self.config
        dtype = (jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16"
                 else jnp.float32)
        c = get_color_channels(cfg["dataset"])
        size = cfg["image_size"]
        x_shape = (size, size, c)
        self.unet = Unet.from_config(cfg)
        self.downsample = get_downsampling(cfg, x_shape, dtype=dtype)
        self.upsample = get_upsampling(cfg, x_shape, dtype=dtype)

    def eps(self, z, t, deterministic: bool = True):
        return self.unet(z, t, deterministic)

    def down(self, x, deterministic: bool = True):
        return self.downsample(x, deterministic)

    def up(self, z, deterministic: bool = True):
        return self.upsample(z, deterministic)

    def __call__(self, x, t):
        z = self.down(x)
        eps = self.eps(z, t)
        x_hat = self.up(z)
        return eps, x_hat


def _apply_fn(net: nn.Module, method=None) -> Callable:
    """Wrap module.apply as (params, x, t?, rng, train) for the process."""

    def eps_fn(params, x_t, t, rng, train):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if method is None:
            return net.apply(params, x_t, t, deterministic=not train, rngs=rngs)
        return net.apply(params, x_t, t, deterministic=not train, rngs=rngs,
                         method=method)

    return eps_fn


def _resample_fn(net: nn.Module, method: str) -> Callable:
    def fn(params, x, rng, train):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return net.apply(params, x, deterministic=not train, rngs=rngs,
                         method=method)

    return fn


def build_model(config: dict):
    """Returns (net_module, diffusion_process, init_fn).

    init_fn(rng) -> params for the full model.
    """
    color_channels = get_color_channels(config["dataset"])
    size = config["image_size"]
    schedule = DiffusionSchedule.create(config["beta_schedule"], config["T"])
    # pin the attention numerics path into the config (and hence the
    # checkpoint): 'auto' resolved here, not silently at module build
    config = dict(config)
    config["use_pallas_attention"] = resolve_use_pallas(config)

    if config["model"] == "ddpm":
        # plain DDPM: UNet runs at image resolution and channels
        config = dict(config)
        config["unet_in"] = color_channels
        net = Unet.from_config(config)
        process = GaussianDiffusion(
            schedule,
            _apply_fn(net),
            sample_shape=(size, size, color_channels),
            loss_type=config["loss_type"],
            loss_flat=config["loss_flat"],
        )

        def init_fn(rng):
            x = jnp.zeros((1, size, size, color_channels))
            t = jnp.zeros((1,), jnp.int32)
            return net.init(rng, x, t)

        return net, process, init_fn, config

    if config["model"] == "dddpm":
        unet_in = config["unet_in"]
        assert unet_in >= color_channels, (
            f"Input channels to DDPM-Unet {unet_in} should be equal or larger "
            f"to data color channels {color_channels}."
        )
        dim_reduc = int(2 ** config["n_downsamples"])
        if size % dim_reduc:
            raise ValueError(
                f"image_size {size} is not divisible by the downsample "
                f"factor 2^{config['n_downsamples']} = {dim_reduc}")
        z_size = size // dim_reduc
        net = DDDPMNet(config=config)
        cls = (DownsampleDiffusionAutoencoder if config["ae_loss"]
               else DownsampleDiffusion)
        process = cls(
            schedule,
            _apply_fn(net, method="eps"),
            _resample_fn(net, "down"),
            _resample_fn(net, "up"),
            x_shape=(size, size, color_channels),
            sample_shape=(z_size, z_size, unet_in),
            loss_type=config["loss_type"],
            loss_flat=config["loss_flat"],
            t_rec_max=config["t_rec_max"],
            force_latent=config["force_latent"],
            # compact recon branch: AE variant only (the non-AE variant's
            # recon grads flow through the UNet, which needs the full
            # batch anyway), and only with deterministic resamplers so
            # the compact/dense branches agree exactly
            recon_compact=(bool(config.get("recon_compact", True))
                           and config["ae_loss"]
                           and config.get("d_dropout", 0) == 0),
        )

        def init_fn(rng):
            x = jnp.zeros((1, size, size, color_channels))
            t = jnp.zeros((1,), jnp.int32)
            return net.init(rng, x, t)

        return net, process, init_fn, config

    raise NotImplementedError(f"model {config['model']} not implemented")


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
