"""Config/CLI tests: flag surface, merge order, ddpm->dddpm rewrite."""
import pytest

from dddpm_tpu.config import (
    CONFIG_MODEL,
    DATASETS,
    MODEL_NAMES,
    build_config,
    get_args,
    modify_config,
)


def test_modify_config_overwrites():
    cfg = {"lr": 1e-3, "a": 1}
    out = modify_config(cfg, {"lr": 2e-4, "b": 2})
    assert out["lr"] == 2e-4 and out["a"] == 1 and out["b"] == 2


def test_default_args():
    config, mute = get_args(argv=[])
    assert config["model"] == "ddpm"
    assert config["dataset"] == DATASETS[0]
    assert config["n_steps"] == 500
    assert config["batch_size"] == 32
    assert config["image_size"] == 32
    assert config["n_downsamples"] == 0
    assert mute is False
    # ddpm defaults applied
    assert config["lr"] == 2e-4
    assert config["T"] == 1000
    assert config["unet_dims"] == (1, 2, 2, 2)
    assert config["ema_decay"] == 0.995
    assert config["loss_flat"] == "sum"


def test_reference_cli_surface():
    argv = "-m ddpm -d celeba_hq -e 800000 -bs 32 -is 256 -downsample 3 -mute".split()
    config, mute = get_args(argv=argv)
    assert mute is True
    assert config["n_steps"] == 800000
    assert config["image_size"] == 256
    # downsample>0 rewrites the model and merges dddpm config
    assert config["model"] == "dddpm"
    assert config["n_downsamples"] == 3
    assert config["unet_in"] == 8
    assert config["ae_loss"] is True
    assert config["t_rec_max"] == 100
    assert config["d_mode"] == "convolutional_res"


def test_downsample_zero_stays_ddpm():
    config, _ = get_args(argv=["-downsample", "0"])
    assert config["model"] == "ddpm"
    assert "ae_loss" not in config


def test_tpu_extensions():
    config, _ = get_args(argv=["--compute-dtype", "float32", "--seed", "7"])
    assert config["compute_dtype"] == "float32"
    assert config["seed"] == 7
    assert config["grad_accum"] == 2


def test_invalid_dataset_rejected():
    with pytest.raises(SystemExit):
        get_args(argv=["-d", "imagenet"])


def test_build_config_merge_order():
    # CLI values survive the model-config merge except where the model
    # dict overrides (lr), matching reference train.py:71-75 semantics
    cfg = build_config({"model": "ddpm", "dataset": "mnist", "n_steps": 9,
                        "batch_size": 4, "image_size": 16,
                        "n_downsamples": 0})
    assert cfg["n_steps"] == 9 and cfg["lr"] == 2e-4
