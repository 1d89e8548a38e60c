"""Test harness configuration.

- Forces JAX onto a virtual 8-device CPU mesh (the standard substitute for multi-chip
  TPU testing) — must happen before jax is imported anywhere.
- Enables x64 so parity suites can compare against the float64 NumPy reference
  bit-for-bit; fast-path (f32) code declares its dtypes explicitly.
- Puts /root/reference on sys.path so tests can drive the original Gymnasium
  implementation as a golden oracle (imported, never copied).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU via the config API
# (must happen before any backend touch — conftest imports first).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import warnings

warnings.filterwarnings("ignore", category=UserWarning, module="gymnasium")
warnings.filterwarnings("ignore", category=DeprecationWarning, module="environment.*")
