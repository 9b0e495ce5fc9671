"""Diffusion beta schedules and the derived schedule buffers.

Reproduces the semantics of the reference implementation
(``/root/reference/models/diffusion/beta_schedule.py`` and the buffer
precompute in ``/root/reference/models/diffusion/ddpm.py:54-106``) as a
single frozen pytree: all twelve derived arrays are computed once in
float64 numpy and stored as float32 jnp arrays.  Timestep gathers that
the reference routes through ``extract()`` become plain fancy indexing
``schedule.sqrt_alphas_cumprod[t][:, None, None, None]``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

BETA_SCHEDULES = ("linear", "cosine")


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Return the beta array (float64 numpy) for the named schedule.

    ``linear``: Ho et al. schedule scaled by 1000/T so any T works.
    ``cosine``: Nichol & Dhariwal schedule, betas clipped to <= 0.999.
    """
    if schedule == "linear":
        scale = 1000.0 / n_timestep
        return np.linspace(
            scale * linear_start, scale * linear_end, n_timestep, dtype=np.float64
        )
    if schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(steps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        return np.clip(betas, 0.0, 0.999)
    raise ValueError(f"schedule '{schedule}' unknown.")


@struct.dataclass
class DiffusionSchedule:
    """Frozen pytree of all precomputed diffusion-process constants.

    Field names mirror the reference's registered buffers so the
    correspondence is auditable line-by-line.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    vlb_weights: jnp.ndarray

    # static metadata
    timesteps: int = struct.field(pytree_node=False, default=1000)

    @classmethod
    def create(
        cls,
        schedule: str = "linear",
        timesteps: int = 1000,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(schedule, timesteps)
        assert (betas > 0).all() and (betas <= 1).all(), "betas must be in (0, 1]"

        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        # posterior q(x_{t-1} | x_t, x_0): eq. 6 & 7 of the DDPM paper
        posterior_variance = (
            (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod) * betas
        )
        coef_x0 = np.sqrt(alphas_cumprod_prev) * betas / (1.0 - alphas_cumprod)
        coef_xt = np.sqrt(alphas) * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

        # log-variance clipped because the posterior variance is 0 at t=0
        posterior_log_var_clip = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )

        # weights turning L_simple into L_vlb per timestep
        with np.errstate(divide="ignore"):  # posterior_variance[0] == 0
            vlb_weights = betas**2 / (
                2.0 * posterior_variance * alphas * (1.0 - alphas_cumprod)
            )
        vlb_weights[0] = vlb_weights[1]
        assert not np.isnan(vlb_weights).any()

        as_dt = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            betas=as_dt(betas),
            alphas_cumprod=as_dt(alphas_cumprod),
            alphas_cumprod_prev=as_dt(alphas_cumprod_prev),
            sqrt_alphas_cumprod=as_dt(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=as_dt(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=as_dt(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=as_dt(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=as_dt(np.sqrt(1.0 / alphas_cumprod - 1.0)),
            posterior_variance=as_dt(posterior_variance),
            posterior_log_variance_clipped=as_dt(posterior_log_var_clip),
            posterior_mean_coef1=as_dt(coef_x0),
            posterior_mean_coef2=as_dt(coef_xt),
            vlb_weights=as_dt(vlb_weights),
            timesteps=timesteps,
        )


def gather(buf: jnp.ndarray, t: jnp.ndarray, ndim: int = 4) -> jnp.ndarray:
    """Gather per-timestep constants and broadcast against an ndim tensor.

    Equivalent to the reference's ``extract(buffer, t, x.shape)``:
    returns shape (B, 1, 1, ..., 1) with ``ndim`` total dims.
    """
    out = buf[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))
