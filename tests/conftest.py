"""Test config: force CPU backend with 8 virtual devices for sharding tests.

Must run before any jax computation.  The axon TPU plugin may already be
registered (sitecustomize), but backend *initialization* is deferred, so
switching platforms + XLA flags here still takes effect.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
