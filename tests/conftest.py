"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-device data parallelism is tested
with `--xla_force_host_platform_device_count=8` on CPU, no TPU required.

NOTE: the image's experimental 'axon' TPU plugin registers itself regardless
of JAX_PLATFORMS, so we cannot filter it out; instead the CPU backend (which
always coexists) is made the default device and meshes are built from
`jax.devices('cpu')` (see `tests/utils.py cpu_devices`).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass  # CPU backend always exists in practice
