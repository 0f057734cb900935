"""Test harness: run everything on a virtual 8-device CPU mesh.

jax is preloaded at interpreter startup in this environment (so env-var
overrides are too late); use jax.config.update before any backend use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
