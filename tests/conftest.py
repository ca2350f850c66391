"""Test configuration: run everything on a virtual 8-device CPU mesh.

Standard JAX practice for testing pjit/psum/mesh code without a pod
(SURVEY.md section 4): force the host platform and fake 8 devices before jax
initialises.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config flag takes precedence.
jax.config.update("jax_platforms", "cpu")
