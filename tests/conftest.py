"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices — the fake-backend story the reference
library never had (see SURVEY.md §4).  Must run before jax is imported.
"""

import os

# Force CPU even when the session environment pins JAX_PLATFORMS to a TPU
# backend; set FEWBIT_TEST_TPU=1 to run the suite on real hardware instead.
if os.environ.get("FEWBIT_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # A sitecustomize on this image may re-register a TPU plugin and force
    # jax_platforms programmatically; override it back after import.
    import jax

    jax.config.update("jax_platforms", "cpu")
