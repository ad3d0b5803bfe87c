"""TPU compiler tuning knobs (measured on v5e, docs/PERFORMANCE.md).

``xla_tpu_scoped_vmem_limit_kib=65536`` raises the per-fusion VMEM budget
from the default (~16 MB) to 64 MB, letting XLA form larger conv+elementwise
fusions for the 512² UNet inference graph: measured 504 → 520 img/s/chip at
batch 128. The TRAIN step shows no benefit (within noise) so the option is
applied to inference-only jits. No effect on numerics.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

INFERENCE_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def inference_jit(fn: Callable, **jit_kwargs: Any) -> Callable:
    """``jax.jit`` with the measured inference compiler options on TPU
    backends; plain ``jax.jit`` elsewhere (CPU tests, interpret mode)."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing never fatal
        on_tpu = False
    if on_tpu:
        jit_kwargs.setdefault("compiler_options", INFERENCE_COMPILER_OPTIONS)
    return jax.jit(fn, **jit_kwargs)
