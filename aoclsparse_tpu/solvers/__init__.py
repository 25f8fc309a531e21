"""Preconditioners (ILU0, SymGS, SOR) and the CG/GMRES Krylov layer."""

from .ilu import IluState, ilu0_factorize, ilu_smoother  # noqa: F401
from .sorv import sorv  # noqa: F401
from .symgs import symgs, symgs_mv  # noqa: F401
