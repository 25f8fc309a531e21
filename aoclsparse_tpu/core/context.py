"""Runtime context singleton: the TPU analog of the reference's cpuid/thread
context (library/src/include/aoclsparse_context.hpp:130-379 and the singleton
at src/extra/aoclsparse_context.cpp:32-37).

Where the reference detects Zen arch + AVX flags and a thread budget, we
detect the JAX backend (tpu/cpu/gpu), device generation, HBM bandwidth for
roofline accounting, VMEM budget for the planner, and the default device mesh.
Env overrides (the AOCL_ENABLE_INSTRUCTIONS analog):

- ``AOCLSPARSE_TPU_FORCE_KID``  — global kernel-id override (debugging)
- ``AOCLSPARSE_TPU_DISABLE_PALLAS`` — forbid Pallas kernels (pure-XLA mode)
"""

from __future__ import annotations

import dataclasses
import os
import threading
from typing import Optional

import jax

__all__ = ["Context", "get_context", "reset_context"]

# Published peak HBM bandwidth (GB/s) per device generation — used only for
# roofline reporting, never for correctness.
_HBM_GBPS = {
    "TPU v2": 700.0,
    "TPU v3": 900.0,
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "cpu": 50.0,
}

_VMEM_BYTES_DEFAULT = 16 * 1024 * 1024


@dataclasses.dataclass
class Context:
    platform: str
    device_kind: str
    num_devices: int
    hbm_gbps: float
    vmem_bytes: int
    pallas_ok: bool
    force_kid: Optional[int]

    @property
    def is_tpu(self) -> bool:
        return self.platform in ("tpu", "axon")

    def sublane(self, dtype) -> int:
        """Minimum second-to-last tile dim for dtype (pallas tiling table)."""
        import jax.numpy as jnp

        dt = jnp.dtype(dtype)
        if dt.itemsize >= 4:
            return 8
        if dt.itemsize == 2:
            return 16
        return 32

    lane: int = 128


_lock = threading.Lock()
_ctx: Optional[Context] = None


def _detect() -> Context:
    devs = jax.devices()
    d0 = devs[0]
    platform = d0.platform
    kind = getattr(d0, "device_kind", platform)
    hbm = 819.0
    for key, bw in _HBM_GBPS.items():
        if key.lower() in str(kind).lower():
            hbm = bw
            break
    else:
        if platform == "cpu":
            hbm = _HBM_GBPS["cpu"]
    force_kid = os.environ.get("AOCLSPARSE_TPU_FORCE_KID")
    pallas_ok = os.environ.get("AOCLSPARSE_TPU_DISABLE_PALLAS", "0") not in ("1", "true")
    # Pallas TPU kernels need a real TPU; CPU runs use interpret mode only in
    # tests, so default them off for performance paths.
    # AOCLSPARSE_TPU_FORCE_PALLAS=1 keeps them selectable on CPU (interpret
    # mode) so the Pallas-routed planner paths are testable off-chip.
    if platform not in ("tpu", "axon") and os.environ.get(
        "AOCLSPARSE_TPU_FORCE_PALLAS", "0"
    ) not in ("1", "true"):
        pallas_ok = False
    return Context(
        platform=platform,
        device_kind=str(kind),
        num_devices=len(devs),
        hbm_gbps=hbm,
        vmem_bytes=_VMEM_BYTES_DEFAULT,
        pallas_ok=pallas_ok,
        force_kid=int(force_kid) if force_kid is not None else None,
    )


def get_context() -> Context:
    global _ctx
    if _ctx is None:
        with _lock:
            if _ctx is None:
                _ctx = _detect()
    return _ctx


def reset_context() -> None:
    """Drop the cached context (tests switch platforms)."""
    global _ctx
    with _lock:
        _ctx = None
