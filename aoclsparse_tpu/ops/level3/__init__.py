from .csrmm import mm  # noqa: F401
from .trsm import trsm  # noqa: F401
