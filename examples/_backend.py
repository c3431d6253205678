"""Shared example helper: default to the CPU backend.

The ambient env may pin a tunneled TPU where first compiles cost minutes;
examples are demos and should run in seconds anywhere. Set
VERBATIM_EXAMPLE_DEVICE=tpu to run on real hardware instead.
"""

import os


def use_cpu_unless_overridden(virtual_devices: int | None = None) -> None:
    if os.environ.get("VERBATIM_EXAMPLE_DEVICE", "cpu") != "cpu":
        return
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={virtual_devices}"
            ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
