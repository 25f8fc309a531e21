from .csrmm import mm  # noqa: F401
from .spgemm import (  # noqa: F401
    add,
    csr2m,
    sp2m,
    sp2md,
    spmm,
    spmmd,
    sypr,
    syprd,
    syrk,
    syrkd,
)
from .trsm import trsm  # noqa: F401
