"""Distributed execution over jax.sharding meshes (SURVEY.md §2.9/§5.8)."""

from .cg import (  # noqa: F401
    cg_bwd_jit,
    cg_ell_jit,
    dist_cg,
    dist_cg_bwd,
    dist_cg_bwd_halo,
    dist_cg_ell_halo,
    dist_cg_pipelined,
    prepare_dist_ell,
)
from .gmres import dist_gmres_bwd, dist_gmres_bwd_halo, gmres_bwd_jit  # noqa: F401
from .spgemm import (  # noqa: F401
    dist_spgemm_halo,
    dist_spgemm_numeric,
    dist_spgemm_rowpart,
    partition_products,
)
from .partition import nnz_balanced_bounds, pack_balanced_ell  # noqa: F401
from .sweeps import dist_ilu_apply, dist_symgs, dist_symgs_chain  # noqa: F401
from .spmv import (  # noqa: F401
    compact_balanced,
    dist_spmm_bwd_halo,
    dist_spmm_ell_halo_plan,
    dist_spmv_balanced_halo,
    dist_spmv_bwd_halo,
    dist_spmv_bwd_halo_overlap,
    dist_spmv_ell,
    dist_spmv_ell_balanced,
    dist_spmv_ell_halo_plan,
    dist_spmv_ell_sharded_x,
    make_mesh,
    plan_general_halo,
    shard_ell,
)
from .trsv import dist_trsm_pipeline, dist_trsv_levels, dist_trsv_pipeline  # noqa: F401
from .placement import fetch, mesh_is_multiprocess, put  # noqa: F401
from .precond import block_jacobi_inv  # noqa: F401
from .multiproc import global_mesh, init_multiprocess  # noqa: F401
