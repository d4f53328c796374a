import os
import sys

# Tests run on a virtual 8-device CPU mesh (the reference's rank-count-
# independence testing model, SURVEY.md §4.7); the real TPU is used by
# bench.py only.
# Force CPU: the session env exports JAX_PLATFORMS=axon (the tunneled TPU);
# tests must not grab the single real chip (and concurrent test runs would
# deadlock on it).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
