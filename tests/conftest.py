"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of "test multi-node without a cluster" (SURVEY.md §4):
sharding/collective code paths compile and execute on 8 fake CPU devices.
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-sets jax_platforms="axon,cpu" programmatically,
# overriding the env var — push it back to cpu before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
