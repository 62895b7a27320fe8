"""Test configuration: CPU backend with 8 virtual devices.

Mirrors the survey's test strategy (SURVEY.md §4): all unit tests run on
the CPU backend so they are hermetic and fast; an 8-device virtual mesh
(via --xla_force_host_platform_device_count) exercises every sharding /
collective path without TPU hardware.
"""
import os

# Must be set before jax initializes its backends.  The env var alone is
# not enough: a sitecustomize module may import jax at interpreter start
# (with JAX_PLATFORMS pointing at an accelerator plugin), which binds the
# config value before this file runs — so also update the live config.
# TGQ_TEST_TPU=1 keeps the real accelerator backend instead, enabling the
# TPU-gated kernel tests (test_paged_attention.py etc.).
if os.environ.get("TGQ_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if os.environ.get("TGQ_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: TPU-gated runs pay tens of seconds per
# program compile over the remote-chip tunnel; caching makes a full
# TGQ_TEST_TPU=1 pass of the kernel suite rerunnable inside a normal
# shell timeout.  Harmless (and still a speedup) on the CPU backend.
from tgq.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
