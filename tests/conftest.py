"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a host-platform mesh (the driver's
``dryrun_multichip`` does the same); the real TPU chip is reserved for
bench.py. These env vars must be set before jax is imported anywhere.
"""
import os

existing = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in existing:
    os.environ["XLA_FLAGS"] = (
        existing + " --xla_force_host_platform_device_count=8").strip()
# Hermetic tests: never hit the network for tokenizers.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# The environment's axon sitecustomize force-registers the TPU plugin and
# overrides JAX_PLATFORMS via jax.config, so pin the platform through the
# config API (backends are not initialized yet at conftest import time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-epoch / multi-compile tests. Fast iteration loop: "
        "pytest -m 'not slow' (<5 min); run the full suite once per round.")


@pytest.fixture(scope="session")
def tokenizer():
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    return SolidityTokenizer()


@pytest.fixture(scope="session")
def tiny_corpus():
    from sct_gan_tpu.data.synthetic import generate_corpus
    return generate_corpus(n=8, seed=0)
