"""Pallas TPU kernel: fused masked multi-aggregate over dense group slots.

The hot op of the engine (SURVEY §3.2: GroupedAggregateHashTable::AddChunk
is the reference's tightest loop). The XLA lowering via `segment_sum`
scatters is already decent; this kernel is the hand-tuned alternative:

- grid over row tiles; each tile lives in VMEM
- per-tile accumulation into a (D, n_aggs) VMEM scratch without any
  scatter: for a small dense domain D, each slot's partial is a masked
  row-tile reduction (D unrolled VPU reductions per aggregate — fully
  vectorized across the 8×128 lanes)
- the scratch accumulates across sequential grid steps (same output
  block revisited; initialized on the first step), the standard Pallas
  reduction pattern

Values are float32/int32 per the v5e's native datapath (the exact int64
path stays on the XLA segment_sum route); this kernel serves the
approximate/floating aggregates and is the template for int32-pair exact
kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 2048  # 16 sublane-groups of 128 lanes


def _agg_kernel(x_ref, gid_ref, live_ref, out_ref, *, domain: int):
    """One grid step: accumulate a row tile into the (domain, n_stats) block.

    out layout: row d = [sum, count] for slot d.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    x = x_ref[:]              # (TILE_ROWS,) f32
    gid = gid_ref[:]          # (TILE_ROWS,) i32
    live = live_ref[:]        # (TILE_ROWS,) bool

    # D unrolled masked reductions — no scatter, pure VPU
    for d in range(domain):
        m = jnp.logical_and(live, gid == d)
        s = jnp.sum(jnp.where(m, x, 0.0))
        c = jnp.sum(m.astype(jnp.float32))
        out_ref[d, 0] = out_ref[d, 0] + s
        out_ref[d, 1] = out_ref[d, 1] + c


def masked_group_sum_count(x, gid, live, domain: int, interpret: bool = False):
    """→ (domain, 2) float32: per-slot [sum, count] of live rows.

    x: (N,) float32, gid: (N,) int32 in [0, domain), live: (N,) bool.
    N must be a multiple of TILE_ROWS (the engine's pad buckets are).
    """
    n = x.shape[0]
    assert n % TILE_ROWS == 0, "pad to TILE_ROWS"
    grid = (n // TILE_ROWS,)
    return pl.pallas_call(
        partial(_agg_kernel, domain=domain),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_ROWS,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((domain, 2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((domain, 2), jnp.float32),
        interpret=interpret,
    )(x, gid, live)
