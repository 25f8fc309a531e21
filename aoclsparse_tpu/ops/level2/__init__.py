from .format_mv import (  # noqa: F401
    blkcsrmv,
    bsrmv,
    csrmv,
    diamv,
    ellmv,
    ellthybmv,
    elltmv,
)
from .mv import dotmv, mv  # noqa: F401
