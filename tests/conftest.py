import os

# Force an 8-device virtual CPU mesh for all tests: sharding/collective layout
# is validated without TPU hardware (SURVEY.md §4). Must be set before jax
# import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
