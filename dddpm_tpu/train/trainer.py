"""The training loop.

Behavioural parity with trainers/trainer.py + trainer_ddpm.py: gradient
accumulation x2, grad-clip 1.0, Adam, EMA (start 2000 / every 10),
per-step 'train_obj' (+ 'train_latent'/'train_recon' for dDDPM) logging,
checkpoints + sample/recon image grids every 10k steps, losses JSON at
finalize.

TPU-first differences:
- the whole optimizer step (micro-batch scan, clip, Adam, EMA) is ONE
  jitted donated program over a data-parallel mesh;
- no per-micro-batch host sync: metrics stay device-resident and are
  only materialized when the log buffer flushes;
- checkpoints are orbax pytrees {params, ema, opt_state, step, rng}.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dddpm_tpu.data.pipeline import get_dataloader, prefetch
from dddpm_tpu.models.factory import build_model, param_count
from dddpm_tpu.parallel.fsdp import shard_state_fsdp
from dddpm_tpu.parallel.mesh import create_mesh, replicated
from dddpm_tpu.train import checkpoint as ckpt
from dddpm_tpu.train.state import (
    create_optimizer,
    create_train_state,
    make_train_step,
)
from dddpm_tpu.utils.logging import RunLogger, generate_run_id
from dddpm_tpu.utils.rng import seed_everything
from dddpm_tpu.utils.timing import StepTimer


def _min_max_norm_image(x: np.ndarray) -> np.ndarray:
    b = x.shape[0]
    flat = x.reshape(b, -1)
    lo = flat.min(1).reshape((b,) + (1,) * (x.ndim - 1))
    hi = flat.max(1).reshape((b,) + (1,) * (x.ndim - 1))
    return (x - lo) / np.maximum(hi - lo, 1e-12)


class Trainer:
    """Step-driven trainer for DDPM and dDDPM models."""

    def __init__(
        self,
        config: Dict,
        mute: bool = False,
        data_root: str = "./data/",
        wandb_project: str = "ddpm-test",
        seed: Optional[int] = 0,
        workdir: str = "./results",
        n_samples: int = 25,
    ):
        self.base_rng = seed_everything(seed)
        self.mute = mute
        self.workdir = workdir
        self.project = wandb_project
        self.n_samples = n_samples
        self.n_rows = int(np.sqrt(n_samples))
        if self.n_rows ** 2 != n_samples:
            raise ValueError(f"n_samples ({n_samples}) must be square")
        if n_samples > config["batch_size"]:
            raise ValueError(
                f"n_samples ({n_samples}) must be <= batch size "
                f"({config['batch_size']})")
        if config.get("conv_quant"):
            raise ValueError(
                "conv_quant is a sampling/serving-only mode (the "
                "quantized conv path has no VJP — jnp.round's gradient "
                "is zero a.e.); train without it and pass "
                "--quant-conv at generation time")

        # data
        self.train_loader, self.val_loader = get_dataloader(
            config, True, data_root, config.get("val_split", 0), seed=seed or 0)
        self.train_iter = self.train_loader.cycle()

        # model + process
        self.net, self.process, init_fn, config = build_model(config)
        self.config = config
        self.is_downsampled = config["model"] == "dddpm"
        self.name = f"{config['model']}_{config['T']}"

        # mesh + state: batch sharded over 'data'; params replicated, or
        # FSDP-sharded over the data axis when config['fsdp'] is set
        self.mesh = create_mesh(config.get("mesh_shape"))
        self.use_fsdp = bool(config.get("fsdp", False))
        # gather-compacted recon is a single-chip optimization: under a
        # batch-sharded mesh the argsort/take compaction forces
        # all-gathers of the image batch inside the step (HLO-verified,
        # tests/test_recon_compact.py), and with the batch split 8 ways
        # the per-device capacity ~= the local batch anyway — so the
        # dense branch is both cheaper and collective-free there
        if (getattr(self.process, "recon_compact", False)
                and self.mesh.devices.size > 1):
            self.process.recon_compact = False
        self.grad_accum = int(config.get("grad_accum", 2))
        self.tx = create_optimizer(config["lr"])
        state = create_train_state(config, init_fn, self.base_rng, self.tx)
        self.state = self._shard_state(state)
        config["model_size"] = param_count(state.params)

        ema_decay = config.get("ema_decay", 0.995)
        self.use_ema = ema_decay > 0
        self._step_fn = jax.jit(
            make_train_step(self.process, self.tx, self.grad_accum,
                            ema_decay=ema_decay),
            donate_argnums=0,
        )
        self._batch_sharding = NamedSharding(self.mesh, P(None, "data"))

        # host batch prep (gather + transform + stack + H2D) runs on a
        # background thread so it overlaps device compute — the TPU
        # analogue of the reference's num_workers=4 DataLoader
        # (utils/data.py:153); prefetch=0 falls back to inline prep
        depth = int(config.get("prefetch", 2))
        batches = self._host_batches()
        self._batch_iter = prefetch(batches, depth) if depth > 0 else batches

        # fixed "val" batch: first image repeated n_samples times
        # (reference trainer_ddpm.py:21-29; comes from train set when
        # val_split == 0)
        src = self.val_loader if self.val_loader is not None else self.train_loader
        first = next(iter(src))[0][0]
        self.val_batch = jnp.asarray(np.repeat(first[None], n_samples, axis=0))

        # jitted eval-time functions (EMA params preferred)
        self._sample_fn = jax.jit(
            lambda p, r: self.process.sample(p, r, batch_size=n_samples))
        self._recon_fn = jax.jit(
            lambda p, r, x: self.process.reconstruct(p, r, x, n_samples))

        # loop bookkeeping
        self.n_steps = config["n_steps"]
        self.logging_every = 10000
        self.flush_every = 200
        self.train_losses = []
        self._metric_buffer = []
        self.run_id = config.get("wandb_id") or generate_run_id()
        config["wandb_id"] = self.run_id
        self.checkpoint_dir = os.path.join(
            workdir, "checkpoints", f"{self.name}_{self.run_id}")
        self.logger: Optional[RunLogger] = None
        self.timer = StepTimer(
            items_per_step=self.grad_accum * config["batch_size"])

    def _shard_state(self, state):
        if self.use_fsdp:
            return shard_state_fsdp(
                state, self.mesh,
                min_size=int(self.config.get("fsdp_min_size", 2 ** 16)))
        return jax.device_put(state, replicated(self.mesh))

    # ------------------------------------------------------------------ io

    @property
    def step(self) -> int:
        return int(self.state.step)

    def save_checkpoint(self):
        ckpt.save_checkpoint(self.checkpoint_dir, self.state, self.config,
                             self.train_losses)

    def load_checkpoint(self, ckpt_dir: str):
        """Restore state (+ step + losses) from an orbax checkpoint dir."""
        self.state = self._shard_state(
            ckpt.restore_checkpoint(ckpt_dir, self.state))
        self.train_losses = ckpt.load_losses(ckpt_dir)

    # ------------------------------------------------------------ sampling

    def _eval_params(self):
        return self.state.ema_params if self.use_ema else self.state.params

    def sample(self, rng=None):
        rng = rng if rng is not None else jax.random.fold_in(
            self.base_rng, 10_000 + self.step)
        return self._sample_fn(self._eval_params(), rng)

    def recon(self, x, rng=None):
        rng = rng if rng is not None else jax.random.fold_in(
            self.base_rng, 20_000 + self.step)
        return self._recon_fn(self._eval_params(), rng, x)

    def log_images(self):
        """Sample + reconstruction grids, mirroring reference wandb keys."""
        if self.is_downsampled:
            x_sample, z_sample = self.sample()
            x_recon, z_recon = self.recon(self.val_batch)
            z_sample = np.asarray(z_sample).mean(-1, keepdims=True)
            z_recon = np.asarray(z_recon).mean(-1, keepdims=True)
            images = {
                "sample": np.asarray(x_sample), "recon": np.asarray(x_recon),
                "sample_latent": z_sample, "recon_latent": z_recon,
            }
        else:
            images = {
                "sample": np.asarray(self.sample()),
                "recon": np.asarray(self.recon(self.val_batch)),
            }
        images = {k: _min_max_norm_image(v) for k, v in images.items()}
        self.logger.log_images(images, self.step, nrow=self.n_rows)

    # ---------------------------------------------------------------- loop

    def _host_batches(self):
        """Infinite stream of (accum, B, H, W, C) device batches, sharded."""
        while True:
            xs = [next(self.train_iter)[0] for _ in range(self.grad_accum)]
            batch = np.stack(xs, axis=0)
            yield jax.device_put(batch, self._batch_sharding)

    def _next_batch(self) -> jnp.ndarray:
        return next(self._batch_iter)

    def _flush_metrics(self, upto_step: int):
        for offset, metrics in enumerate(self._metric_buffer):
            step = upto_step - len(self._metric_buffer) + offset + 1
            row = {k: float(np.asarray(v)) for k, v in metrics.items()}
            self.train_losses.append(row["train_obj"])
            self.logger.log(row, step)
        self._metric_buffer = []
        self.logger.flush()

    def _install_preemption_handler(self):
        """Checkpoint on SIGTERM/SIGINT — preemption-aware training
        (SURVEY.md §5: the idiomatic TPU extension over the reference's
        manual resume)."""
        import signal

        def handler(signum, frame):
            self._flush_metrics(self.step)
            self.save_checkpoint()
            print(f"caught signal {signum}: checkpoint saved at step "
                  f"{self.step}, exiting")
            raise SystemExit(128 + signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except ValueError:  # not in main thread
                pass

    def train_loop(self, profile_dir: Optional[str] = None):
        self._install_preemption_handler()
        while self.step < self.n_steps:
            if profile_dir is not None and self.step == 10:
                jax.profiler.start_trace(profile_dir)
            if profile_dir is not None and self.step == 20:
                jax.profiler.stop_trace()
            batch = self._next_batch()
            self.state, metrics = self._step_fn(self.state, batch)
            self.timer.mark()
            self._metric_buffer.append(metrics)

            step = len(self.train_losses) + len(self._metric_buffer)
            is_log = step != 0 and step % self.logging_every == 0
            if is_log or len(self._metric_buffer) >= self.flush_every:
                self._flush_metrics(step)
            if is_log:
                self.save_checkpoint()
                self.log_images()
                if not self.mute:
                    stats = self.timer.stats()
                    print(f"step {step}: train_obj="
                          f"{self.train_losses[-1]:.4f} "
                          f"imgs/sec={stats.get('items_per_sec', 0):.1f}")

    def init_logging(self):
        self.logger = RunLogger(self.project, self.config, self.run_id,
                                mute=self.mute)

    def finalize(self):
        self._flush_metrics(self.step)
        self.save_checkpoint()
        self.logger.finish()
        if not self.mute:
            print(f"Training of {self.name} completed!")

    def train(self):
        """init logging -> train_loop -> finalize (reference trainer.py:101)."""
        self.init_logging()
        self.train_loop()
        self.finalize()
        return self.train_losses


def setup_trainer(config: Dict, mute: bool = False, data_root: str = "./data/",
                  wandb_project: str = "ddpm-test", seed: Optional[int] = 0,
                  workdir: str = "./results", n_samples: int = 25):
    """Factory mirroring reference trainers/wrapper.py:10-49."""
    n_samples = min(n_samples, config["batch_size"])
    n_samples = int(np.sqrt(n_samples)) ** 2  # keep it square
    trainer = Trainer(config, mute, data_root, wandb_project, seed, workdir,
                      n_samples=n_samples)
    return trainer, trainer.config
