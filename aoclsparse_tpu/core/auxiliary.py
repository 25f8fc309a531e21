"""Auxiliary/introspection API.

Reference: src/extra/aoclsparse_auxiliary.cpp — get_version (:35),
enable_instructions (:53), debug_get (:116), is_avx512_build, handle-level
convert_csr/convert_bsr (conversion/aoclsparse_convert.cpp:1004-1471).
"""

from __future__ import annotations

from typing import Optional

from ..core.context import get_context, reset_context
from ..core.matrix import SparseMatrix
from ..core.types import AoclSparseError, FormatType, Operation, Status

__all__ = [
    "convert_csr",
    "convert_bsr",
    "convert_format",
    "debug_get",
    "is_tpu_build",
    "enable_instructions",
    "set_precision_mode",
]


def convert_csr(h: SparseMatrix, op: Operation = Operation.none) -> SparseMatrix:
    """New CSR-format handle holding op(A) (aoclsparse_convert_csr,
    conversion/aoclsparse_convert.cpp:1004)."""
    from ..convert import conversions as cv

    if h is None:
        raise AoclSparseError(Status.invalid_pointer, "null matrix")
    A = cv.to_csr(h.data)
    A = cv.csr_apply_operation(A, op)
    return SparseMatrix(A, FormatType.csr, h.base)


def convert_bsr(
    h: SparseMatrix, block_dim: int, op: Operation = Operation.none
) -> SparseMatrix:
    """CSR -> BSR handle conversion (aoclsparse_convert_bsr)."""
    from ..convert import conversions as cv

    if h is None:
        raise AoclSparseError(Status.invalid_pointer, "null matrix")
    if block_dim <= 0:
        raise AoclSparseError(Status.invalid_size, "block_dim must be positive")
    A = cv.csr_apply_operation(cv.to_csr(h.data), op)
    return SparseMatrix(cv.csr_to_bsr(A, block_dim), FormatType.bsr, h.base)


def convert_format(h: SparseMatrix, fmt: FormatType, op: Operation = Operation.none, **kw):
    """Generic handle-level format conversion."""
    from ..convert import conversions as cv

    if h is None:
        raise AoclSparseError(Status.invalid_pointer, "null matrix handle")
    try:
        fmt = FormatType(fmt)
    except ValueError:
        raise AoclSparseError(Status.invalid_value, f"unknown format {fmt!r}") from None
    if fmt == FormatType.csr:
        return convert_csr(h, op)
    if fmt == FormatType.bsr:
        return convert_bsr(h, kw.get("block_dim", 2), op)
    A = cv.csr_apply_operation(cv.to_csr(h.data), op)
    if fmt == FormatType.csc:
        return SparseMatrix(cv.to_csc(A), FormatType.csc, h.base)
    if fmt == FormatType.coo:
        return SparseMatrix(cv.to_coo(A), FormatType.coo, h.base)
    if fmt == FormatType.ell:
        return SparseMatrix(cv.csr_to_ell(A), FormatType.ell, h.base)
    if fmt == FormatType.dia:
        return SparseMatrix(cv.csr_to_dia(A), FormatType.dia, h.base)
    raise AoclSparseError(Status.not_implemented, f"convert to {fmt.name}")


def debug_get() -> dict:
    """Runtime introspection (aoclsparse_debug_get analog: ISA/arch/threads
    there; platform/device/HBM/native-library here)."""
    from .. import native
    from .. import __version__

    ctx = get_context()
    return {
        "version": __version__,
        "platform": ctx.platform,
        "device_kind": ctx.device_kind,
        "num_devices": ctx.num_devices,
        "hbm_peak_gbps": ctx.hbm_gbps,
        "vmem_bytes": ctx.vmem_bytes,
        "native_host_kernels": native.available(),
        "pallas_enabled": ctx.pallas_ok,
        "force_kid": ctx.force_kid,
    }


def is_tpu_build() -> bool:
    """Is the TPU fast path active? (aoclsparse_is_avx512_build analog)."""
    return get_context().is_tpu


def enable_instructions(mode: Optional[str]) -> None:
    """Kernel-path override (AOCL_ENABLE_INSTRUCTIONS /
    aoclsparse_enable_instructions analog): "generic" forces the portable
    gather kernels (sets the env override and resets the cached context);
    None/"" restores auto-selection."""
    import os

    if mode in (None, "", "auto"):
        os.environ.pop("AOCLSPARSE_TPU_DISABLE_PALLAS", None)
        os.environ.pop("AOCLSPARSE_TPU_FORCE_GENERIC", None)
    elif mode == "generic":
        os.environ["AOCLSPARSE_TPU_FORCE_GENERIC"] = "1"
    else:
        raise AoclSparseError(Status.invalid_value, f"unknown instruction mode '{mode}'")
    reset_context()


def set_precision_mode(h: SparseMatrix, mode: str) -> None:
    """Per-handle precision policy opt-in (docs/precision.md; no reference
    analog — its kernels are fixed-precision by dtype suffix):

      "full"  — every multiply in the operand dtype (default)
      "mixed" — bf16-multiply/f32-accumulate on f32 operands where a kernel
                supports it (band/bwd/gen SpMV, band SpMM); halves the
                dominant operand traffic at a documented, tested error
                bound (tests/test_precision_policy.py vs the reference
                tolerance model)

    The AOCLSPARSE_TPU_MIXED_PRECISION env var overrides in both
    directions ("1" forces on, "0" kills)."""
    if h is None:
        raise AoclSparseError(Status.invalid_pointer, "null matrix handle")
    if mode not in ("full", "mixed"):
        raise AoclSparseError(Status.invalid_value, f"unknown precision mode '{mode}'")
    h.precision_mode = mode
