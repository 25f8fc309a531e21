"""Pallas TPU kernels (optional path; see spmv.py header for why the fused
XLA formulations are the default on this stack). Registered into the KAT
table only when AOCLSPARSE_TPU_ENABLE_PALLAS=1."""

import os

from .spmv import pallas_spmv_bwd  # noqa: F401

if os.environ.get("AOCLSPARSE_TPU_ENABLE_PALLAS", "0") in ("1", "true"):
    from ..registry import KernelEntry, registry

    def _pallas_bwd_adapter(win_val, xp, W, base8, n_pad, mixed=False):
        return pallas_spmv_bwd(win_val, xp, W, base8, n_pad)

    registry.register(
        "mv", KernelEntry(10, "pallas_bwd", _pallas_bwd_adapter, "bwd", "tpu", 2)
    )
