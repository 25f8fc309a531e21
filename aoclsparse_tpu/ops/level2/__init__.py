from .mv import dotmv, mv  # noqa: F401
