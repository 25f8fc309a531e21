"""Matrix I/O (MatrixMarket, the reference bench harness's input format)."""

from .mm import read_mtx, read_mtx_arrays, write_mtx  # noqa: F401
from .plancache import load_plan, save_plan  # noqa: F401
