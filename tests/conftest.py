"""Test configuration: force an 8-device virtual CPU mesh.

The environment's sitecustomize registers a remote-TPU PJRT plugin and
makes it the default platform via ``jax.config``; plain env vars can't
override that (the plugin re-writes ``jax_platforms`` at import). So the
conftest re-points ``jax_platforms`` at cpu *before any backend is
initialized* and requests 8 virtual host devices so multi-chip sharding
paths are exercised without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
