from dddpm_tpu.models.schedule import DiffusionSchedule, make_beta_schedule
from dddpm_tpu.models.unet import Unet
from dddpm_tpu.models.ddpm import GaussianDiffusion
from dddpm_tpu.models.dddpm import (
    DownsampleDiffusion,
    DownsampleDiffusionAutoencoder,
)
from dddpm_tpu.models.factory import build_model, get_color_channels, param_count

MODEL_NAMES = ["ddpm"]

__all__ = [
    "DiffusionSchedule", "make_beta_schedule", "Unet", "GaussianDiffusion",
    "DownsampleDiffusion", "DownsampleDiffusionAutoencoder", "build_model",
    "get_color_channels", "param_count", "MODEL_NAMES",
]
