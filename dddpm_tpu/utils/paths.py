"""Artifact directory configuration.

The reference hard-codes HPC paths (utils/paths.py); here every
directory is env-overridable with sensible repo-local defaults.
"""
from __future__ import annotations

import os

_ROOT = os.environ.get("DDDPM_WORK_DIR", "./results")

WORK_DIR = _ROOT
SAMPLE_DIR = os.environ.get("DDDPM_SAMPLE_DIR", os.path.join(_ROOT, "samples"))
SAMPLE_LATENT_DIR = os.environ.get(
    "DDDPM_SAMPLE_LATENT_DIR", os.path.join(_ROOT, "samples_latent"))
CHECKPOINT_DIR = os.environ.get(
    "DDDPM_CHECKPOINT_DIR", os.path.join(_ROOT, "checkpoints"))
REFERENCE_DIR = os.environ.get(
    "DDDPM_REFERENCE_DIR", os.path.join(_ROOT, "reference"))
LOGGING_DIR = os.environ.get(
    "DDDPM_LOGGING_DIR", os.path.join(_ROOT, "logging"))
DATA_DIR = os.environ.get("DDDPM_DATA_DIR", "../data")
