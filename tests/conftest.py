import os

# Give the CPU backend 8 virtual devices so mesh/sharding tests have a
# multi-device platform everywhere (tests pick them via jax.devices("cpu")).
# JAX_PLATFORMS=cpu below applies on CPU-only machines (CI); on hosts whose
# site config pins a TPU plugin (e.g. the axon relay) the default backend
# stays TPU and the Mosaic-kernel tests run on real hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
