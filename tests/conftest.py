"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* — the standard JAX trick for
exercising multi-chip sharding without hardware (SURVEY.md section 4) — and
must be hermetic even when the ambient session points JAX_PLATFORMS at a
tunneled TPU.  Plugins (jaxtyping) import jax before this conftest runs, so
the platform override must go through jax.config, not os.environ.
"""

import os

# MCOP_TPU_TESTS=1 leaves the ambient platform (e.g. a real TPU) in place so
# the hardware-gated tests (pytest -k pallas) can actually run on the chip;
# the default is the hermetic virtual-8-CPU mesh.  Select specific tests when
# using it — the virtual-mesh sharding tests need 8 devices.
_ON_HW = os.environ.get("MCOP_TPU_TESTS") == "1"

if not _ON_HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_HW:
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except AttributeError:  # older jax: XLA_FLAGS path above covers it
        pass

# Persistent compilation cache for BOTH tiers.  Hardware runs pay
# 20-460 s per jitted program through the axon tunnel; the hermetic CPU
# tier recompiles every program from scratch on every pytest invocation
# otherwise (the cache key includes platform and device count, so CPU and
# TPU entries coexist in one directory and the virtual-8-device programs
# never collide with single-chip ones).  Warm-run measurements:
# VERIFY_r04 "fast tier" section.
from montecarlooptionspricer_tpu.utils import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
