"""Sparse BLAS operations (levels 1-3)."""

from . import level1, level2, level3  # noqa: F401
from .level1 import (  # noqa: F401
    axpyi,
    dotci,
    doti,
    dotui,
    gthr,
    gthrs,
    gthrz,
    roti,
    sctr,
    sctrs,
)
from .level2 import (  # noqa: F401
    blkcsrmv,
    bsrmv,
    csrmv,
    diamv,
    dotmv,
    ellmv,
    ellthybmv,
    elltmv,
    mv,
    mv_operator,
)
from .level2.trsv import csrsv, trsv, trsv_strided  # noqa: F401
from .level3 import (  # noqa: F401
    add,
    csr2m,
    mm,
    sp2m,
    sp2md,
    spmm,
    spmmd,
    sypr,
    syprd,
    syrk,
    syrkd,
    trsm,
)
