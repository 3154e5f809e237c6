"""Test configuration: virtual 8-device CPU mesh, x64 enabled.

Multi-chip sharding is validated on host CPU devices exactly as the
driver does (xla_force_host_platform_device_count); numerical tests run
in float64 to match the reference's -fdefault-real-8 build.

Note: this image's sitecustomize pins JAX_PLATFORMS=axon (a tunneled
TPU), so the platform must be overridden through jax.config, not env.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
