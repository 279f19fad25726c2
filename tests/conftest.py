import os

# Force an 8-device virtual CPU mesh for all tests: sharding/collective layout
# is validated without TPU hardware (SURVEY.md §4).
#
# The environment pre-imports jax via a sitecustomize hook that registers a
# remote-TPU PJRT plugin and *overwrites* jax.config.jax_platforms, so env
# vars alone are ignored. The backend itself is initialized lazily, so
# updating jax.config here (before any jax.devices()/jit call) still wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
