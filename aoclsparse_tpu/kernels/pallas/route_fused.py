"""Fused single-pass Benes router: every stage applied VMEM-resident.

The XLA apply (kernels/xla/route.py apply_benes) round-trips the value
vector through HBM at every one of the 2k-1 stages (~470 MB of traffic at
k=20 — measured ~3.5-6 ms per apply depending on the pool window). Here
the whole padded vector lives in VMEM as an (n/128, 128) tile, the stage
loop is unrolled in ONE kernel, and the cross masks arrive BIT-PACKED
along the stage axis (ceil((2k-1)/8), n/128, 128) uint8 — total traffic
~(2 values + packed masks) ~= 9-13 MB at k=20, bounded by VMEM, not HBM.

Stage strides are powers of two; with the row-major (R, 128) layout the
xor partner i^s splits cleanly:
  s < 128   -> lane roll  +-s  within each sublane row (c^s stays in-row)
  s >= 128  -> sublane roll +-(s/128) (r^(s/128), same lane)
All shifts are static np.int32 (the Mosaic x64 rule, kernels/pallas/spmv).

VMEM bound: (8 + ceil((2k-1)/8)) * 2^k bytes — k<=20 fits v5e; larger
routes take the XLA path (route.py picks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_benes_apply", "pack_masks", "FUSED_MAX_K"]

FUSED_MAX_K = 20


def pack_masks(masks: np.ndarray) -> np.ndarray:
    """(S, n) uint8 cross masks -> (ceil(S/8), n) uint8 with stage t at
    bit t%8 of row t//8."""
    S, n = masks.shape
    packed = np.zeros((-(-S // 8), n), dtype=np.uint8)
    for t in range(S):
        packed[t // 8] |= (masks[t] & 1) << (t % 8)
    return packed


def _kernel(strides, R, v_ref, mp_ref, o_ref):
    u = v_ref[...]  # (R, 128) f32
    iot_r = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    iot_c = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    for t, s in enumerate(strides):
        mbyte = mp_ref[t // 8].astype(jnp.int32)  # (R, 128)
        mask = ((mbyte >> np.int32(t % 8)) & np.int32(1)) != 0
        if s < 128:
            bit = (iot_c & np.int32(s)) != 0
            partner = jnp.where(
                bit,
                pltpu.roll(u, np.int32(s), axis=1),
                pltpu.roll(u, np.int32(128 - s), axis=1),
            )
        else:
            sr = s // 128
            bit = (iot_r & np.int32(sr)) != 0
            partner = jnp.where(
                bit,
                pltpu.roll(u, np.int32(sr), axis=0),
                pltpu.roll(u, np.int32(R - sr), axis=0),
            )
        u = jnp.where(mask, partner, u)
    o_ref[...] = u


@partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_benes_apply(v, masks_packed, k: int, interpret: bool = False):
    """Route v (n = 2^k,) through the packed-mask Benes network in one
    VMEM-resident pass. masks_packed: (ceil((2k-1)/8), n) uint8."""
    from .spmv import _imap32

    n = 1 << k
    R = n // 128
    from ..xla.route import benes_strides

    strides = benes_strides(k)
    v2 = v.reshape(R, 128)
    mp = masks_packed.reshape(masks_packed.shape[0], R, 128)
    out = pl.pallas_call(
        partial(_kernel, strides, R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), v.dtype),
        interpret=interpret,
        # the default 16 MB scoped-vmem cap rejects the k=20 route (v+masks
        # +out+stage temps ~27 MB); v5e accepts the raised limit (measured,
        # parity-checked on hardware)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(v2, mp)
    return out.reshape(-1)
