"""TPU target detection + per-generation default XLA compiler options.

Centralizes two decisions previously duplicated in training/trainer.py and
bench.py (ADVICE round 2):

* `on_tpu_target()` — whether compute will actually land on a TPU: the
  axon plugin registers backend 'tpu', but tests pin `jax_default_device`
  to a CPU device, which must win.
* `default_compiler_options()` — the measured-best per-program XLA options
  for the *detected* TPU generation only.  The scoped-VMEM split
  (112 MiB) was tuned on v5e/v5-lite (128 MiB VMEM, BASELINE.md round-2
  sweep); on generations with different VMEM sizes a hard-coded limit can
  regress or fail compilation, so unknown kinds get no override.
"""

from __future__ import annotations

import jax

__all__ = ["on_tpu_target", "default_compiler_options"]

# device_kind prefix → measured-best per-program options
_KIND_OPTIONS: dict[str, dict[str, str]] = {
    # v5e / v5-lite: 128 MiB VMEM; 112 MiB scoped split measured fastest
    # (BASELINE.md round 2: 96 MiB → 392, 112 MiB → 457 samples/s)
    "TPU v5 lite": {"xla_tpu_scoped_vmem_limit_kib": "114688"},
    "TPU v5e": {"xla_tpu_scoped_vmem_limit_kib": "114688"},
}


def _target_device() -> "jax.Device | None":
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd if getattr(dd, "platform", None) == "tpu" else None
    if jax.default_backend() != "tpu":
        return None
    return jax.devices()[0]


def on_tpu_target(mesh=None) -> bool:
    """True iff jitted programs will execute on TPU hardware."""
    if mesh is not None:
        return mesh.devices.ravel()[0].platform == "tpu"
    return _target_device() is not None


def default_compiler_options(mesh=None) -> dict[str, str] | None:
    """Measured-best XLA options for the target TPU, or None off-TPU /
    on generations we have not tuned."""
    if mesh is not None:
        dev = mesh.devices.ravel()[0]
        if dev.platform != "tpu":
            return None
    else:
        dev = _target_device()
        if dev is None:
            return None
    kind = getattr(dev, "device_kind", "")
    for prefix, opts in _KIND_OPTIONS.items():
        if kind.startswith(prefix):
            return dict(opts)
    return None
