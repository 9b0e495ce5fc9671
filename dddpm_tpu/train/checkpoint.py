"""Orbax checkpointing: {params, ema_params, opt_state, step, rng} +
config/losses JSON sidecars.

Parity with the reference's torch.save dict {optimizer, model, config,
train_losses, step, ema_model} written every 10k steps
(trainers/trainer_ddpm.py:49-62) and the prefer-EMA-at-load rule
(utils/utils.py:51-54).  Resume rebuilds the model from the stored
config, exactly like train_from_checkpoint.py:11-24.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import jax
import orbax.checkpoint as ocp

from dddpm_tpu.train.state import TrainState

_CONFIG_FILE = "config.json"
_LOSSES_FILE = "train_losses.json"
_STATE_DIR = "state"


def _jsonable(config: Dict) -> Dict:
    out = {}
    for k, v in config.items():
        if isinstance(v, tuple):
            v = list(v)
        out[k] = v
    return out


def save_checkpoint(ckpt_dir: str, state: TrainState, config: Dict,
                    train_losses=None) -> str:
    """Write a full checkpoint under ckpt_dir (overwrites in place)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        path = os.path.join(ckpt_dir, _STATE_DIR)
        if os.path.exists(path):
            # orbax refuses to overwrite; replace atomically via tmp name
            import shutil
            shutil.rmtree(path)
        ckptr.save(path, jax.device_get(state))
    with open(os.path.join(ckpt_dir, _CONFIG_FILE), "w") as f:
        json.dump(_jsonable(config), f, indent=2)
    if train_losses is not None:
        with open(os.path.join(ckpt_dir, _LOSSES_FILE), "w") as f:
            json.dump([float(x) for x in train_losses], f)
    return ckpt_dir


def load_config(ckpt_dir: str) -> Dict:
    with open(os.path.join(os.path.abspath(ckpt_dir), _CONFIG_FILE)) as f:
        return json.load(f)


def load_losses(ckpt_dir: str):
    path = os.path.join(os.path.abspath(ckpt_dir), _LOSSES_FILE)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def restore_checkpoint(ckpt_dir: str, abstract_state: TrainState) -> TrainState:
    """Restore a TrainState given an abstract target (from create_train_state
    or jax.eval_shape) so shapes/dtypes/pytree structure are known."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x,
        abstract_state,
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(ckpt_dir, _STATE_DIR), target)


def load_model_params(ckpt_dir: str, abstract_state: TrainState,
                      prefer_ema: bool = True):
    """Eval-time load: EMA weights when present (reference
    utils/utils.py:51-54), else raw params."""
    state = restore_checkpoint(ckpt_dir, abstract_state)
    return state.ema_params if prefer_ema else state.params
