"""Trace-time planner: hint registration + optimize + plan cache."""

from .hints import (  # noqa: F401
    set_2m_hint,
    set_dotmv_hint,
    set_lu_smoother_hint,
    set_memory_hint,
    set_mm_hint,
    set_mv_hint,
    set_mv_hint_kid,
    set_sm_hint,
    set_sorv_hint,
    set_sv_hint,
    set_symgs_hint,
)
from .plan import (  # noqa: F401
    CleanCSR,
    EffectiveCSR,
    ExecForm,
    Plan,
    build_clean_csr,
    build_effective_csr,
    choose_mv_format,
    get_plan,
    optimize,
)
