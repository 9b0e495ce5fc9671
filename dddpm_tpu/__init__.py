"""dddpm_tpu — a TPU-native JAX/XLA/Pallas framework for downsampled
denoising diffusion probabilistic models (dDDPM).

Re-implements the full capability surface of the reference PyTorch repo
(simonamtoft/downsampled-diffusion) as an idiomatic TPU-first framework:

- flax.linen UNet epsilon-predictor in NHWC layout (TPU conv-native)
- DDPM forward/reverse processes as pure jittable functions; the
  1000-step ancestral sampling chain is a single on-device
  ``jax.lax.scan`` (no per-step host round trips)
- dDDPM conv down/upsample wrapper networks running the diffusion
  chain in a spatially reduced latent space
- optax train step with gradient accumulation, global-norm clipping and
  on-device EMA; orbax checkpointing
- ``jax.sharding`` data-parallel mesh layer for multi-chip training and
  bulk FID sampling over ICI
- FID / sFID / IS / precision / recall evaluator
- Pallas kernels for the hot ops (fused linear attention, fused
  sampling-step elementwise chains)

Package layout (maps onto SURVEY.md section 1's layer map):
  models/    schedules + diffusion processes + UNet + resamplers
  ops/       math primitives, image utilities, Pallas kernels
  parallel/  device mesh + sharding
  train/     trainer loop, EMA, checkpointing
  data/      dataset loaders + input pipeline
  evaluation/ FID/IS/sFID/precision/recall
  utils/     seeding, timing, CLI
"""

__version__ = "0.1.0"
