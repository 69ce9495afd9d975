"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device correctness is tested without TPU hardware via
``xla_force_host_platform_device_count`` — the JAX-native replacement for the
reference's (absent) fake-distributed-backend story (SURVEY.md section 4).
Must run before jax initializes its backends, hence env mutation at import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NB: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# present; the config knob is honored. Must run before backend init.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_GD = "/root/reference/examples/guided_diffusion"


@pytest.fixture(autouse=True)
def _fresh_logger():
    """Reset the process-global logger around every test.

    Logger.CURRENT's HumanOutput binds whatever sys.stdout was when the
    logger was first created. Under pytest that is some test's capsys
    stream, which pytest CLOSES at that test's teardown — every later
    logger.log() in the process then raises 'I/O operation on closed
    file' (14 slow-tier tests failed this way under full-suite ordering),
    or silently writes to another test's capture. A fresh logger per test
    rebinds to the current stream."""
    from autodiffusion_tpu.utils import logger

    logger.Logger.CURRENT = None
    yield
    logger.Logger.CURRENT = None


@pytest.fixture(scope="session")
def reference_gd():
    """Import the reference guided_diffusion package for golden-value parity
    tests. Skips if the reference checkout or torch is unavailable."""
    if not os.path.isdir(REFERENCE_GD):
        pytest.skip("reference checkout not available")
    if REFERENCE_GD not in sys.path:
        sys.path.insert(0, REFERENCE_GD)
    try:
        from guided_diffusion import gaussian_diffusion, respace  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return sys.modules["guided_diffusion"]
