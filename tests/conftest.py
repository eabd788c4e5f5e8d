"""Test harness config: force an 8-device virtual CPU mesh.

Must run before the first ``import jax`` anywhere in the test process so
XLA picks up the host-platform device count; this is the TPU-world
substitute for a fake multi-device backend (SURVEY.md section 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Parity tests compare against torch float32 on CPU: keep matmuls exact.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# Force CPU even when the session env points at the real TPU ("axon"):
# unit tests need 8 virtual devices and exact float32 matmuls. The env
# var JAX_PLATFORMS is ignored when the axon PJRT plugin is installed,
# so use the config API (verified in-session).
jax.config.update("jax_platforms", "cpu")
