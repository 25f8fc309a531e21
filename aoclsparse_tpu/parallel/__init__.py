"""Distributed execution over jax.sharding meshes (SURVEY.md §2.9/§5.8)."""

from .spmv import (  # noqa: F401
    dist_spmv_ell,
    dist_spmv_ell_sharded_x,
    make_mesh,
    shard_ell,
)
