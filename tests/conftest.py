"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-device data parallelism is tested
with `--xla_force_host_platform_device_count=8` on CPU, no TPU required.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
