"""Sparse BLAS operations (levels 1-3)."""

from . import level2  # noqa: F401
from .level2 import dotmv, mv  # noqa: F401
