"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-device mesh/pjit code paths are exercised without TPU hardware.

NOTE: this environment preloads jax via sitecustomize (axon TPU plugin), so
the JAX_PLATFORMS env var is captured before conftest runs — we must use
jax.config.update instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's cost on this 1-CPU box is
# ~90% compile time (each method step is a full jitted train program), and
# programs are identical run-to-run — caching them makes the suite
# re-runnable per round (first run pays compile; repeats are ~free).
_CACHE_DIR = os.environ.get(
    "CVSSL_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1337)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8, jax.devices()


# ---------------------------------------------------------------------------
# Suite tiers: -m fast (bounded per-round signal), -m slow (heavy internal),
# -m parity (torch/reference cross-checks; the heaviest). Every test gets
# exactly one tier marker, assigned per file here. Durations measured on
# this 1-CPU box with a warm .jax_cache (see CLAUDE.md).
# ---------------------------------------------------------------------------
_PARITY_FILES = {
    "test_grad_parity.py", "test_grad_parity_more.py",
    "test_grad_parity_vit.py", "test_fit_parity.py",
    "test_torch_parity.py", "test_reference_loss_parity.py",
    "test_gan_scaffolding.py", "test_swin_checkpoint.py",
    "test_cnn_checkpoint.py", "test_cross_teaching_vit.py",
    "test_monai_parity.py", "test_effnet_parity.py",
}
_SLOW_FILES = {
    "test_s2d_3d.py", "test_models_3d.py", "test_swin_unet.py",
    "test_models_zoo.py", "test_models_2d_extra.py", "test_halo.py",
    "test_spatial_parallel.py", "test_s2d_loss.py", "test_engine.py",
    "test_val3d.py", "test_preprocessing_io.py",
    "test_pretrained_ingest.py",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: bounded per-round tier")
    config.addinivalue_line("markers", "slow: heavy internal tests")
    config.addinivalue_line(
        "markers", "parity: cross-checks vs the torch reference")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _PARITY_FILES:
            item.add_marker(pytest.mark.parity)
        elif fname in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
