import os

# Force JAX onto a virtual 8-device CPU mesh for all tests: device-engine
# parity and multi-chip sharding tests run without TPU hardware.
#
# Note: this environment's sitecustomize registers the "axon" TPU plugin at
# interpreter startup and pins JAX_PLATFORMS=axon, so the env var alone is
# not enough — override the config knob before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# CUTESV_TEST_PLATFORM overrides the CPU pin for real-hardware sweeps,
# e.g. CUTESV_TEST_PLATFORM=axon runs the device-parity suites on the
# actual TPU chip (axon is this environment's TPU plugin name).
jax.config.update("jax_platforms",
                  os.environ.get("CUTESV_TEST_PLATFORM", "cpu"))
