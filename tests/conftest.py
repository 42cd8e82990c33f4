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

# Persistent XLA compilation cache: the suite is compile-bound on a 1-CPU
# box (a tiny-UNet program costs ~15-20s to build), and most test programs
# are identical run to run.  Measured: the quick tier drops ~3x warm vs
# cold.  Keyed on program+compile options, so code changes recompile only
# the programs they touch; set SGDM_TEST_NO_COMPILE_CACHE=1 to opt out
# (e.g. when timing true cold compiles).  NOTE: the env var alone is too
# late here — the axon site hook imports jax's config module at interpreter
# start, freezing env-derived defaults — so the config is also set via
# jax.config.update below, after the `import jax`.
_compile_cache_dir = None
if not os.environ.get("SGDM_TEST_NO_COMPILE_CACHE"):
    _compile_cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/sgdm_jax_test_cache"),
    )
    os.makedirs(_compile_cache_dir, exist_ok=True)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

if _compile_cache_dir is not None:
    jax.config.update("jax_compilation_cache_dir", _compile_cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
    )

jax.config.update("jax_threefry_partitionable", True)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass  # CPU backend always exists in practice
