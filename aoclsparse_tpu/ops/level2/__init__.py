from .format_mv import (  # noqa: F401
    blkcsrmv,
    bsrmv,
    csrmv,
    diamv,
    ellmv,
    ellthybmv,
    elltmv,
)
from .mv import mv_operator, MvOperator, dotmv, mv  # noqa: F401
