"""Pallas TPU kernel: exact int64 grouped sums on the MXU, no 64-bit ops.

The hot op of the engine (SURVEY §3.2; the reference's tightest loop is
GroupedAggregateHashTable::AddChunk, src/execution/aggregate_hashtable.cpp).
TPC-H's measure columns are DECIMALs carried as scaled int64, and TPU v5e
has NO native 64-bit datapath: XLA x64-emulates every int64 add/select, so
the dense masked-broadcast reduce (ops/grouped._masked_bcast) pays an
emulated (u32,u32)-pair op chain per row × per slot. This kernel computes
the same per-slot sums EXACTLY with only int32/bf16/f32 hardware ops:

- each (N,) int64 vector splits ELEMENTWISE into two int32 planes (low
  word sign-reinterpreted, high word arithmetic-shifted) — elementwise
  emulated shifts are cheap; what is NOT cheap on this runtime is any
  relayout (interleaved bitcast views measured 21 ms/op in retiling
  passes vs ~0 for the elementwise split)
- planes reshape to (8·blocks, 8192) so every Pallas block is a full
  (8, 8192) sublane×lane tile — a (1, N) stream would waste 7/8 of the
  HBM bandwidth on dead sublanes
- in-kernel, each int32 unpacks to four 8-bit limbs; limbs ≤ 255 are
  EXACT in bfloat16 (8 significand bits); a (nseg, 8192) one-hot of the
  group ids contracts with the (8K, 8192) limb matrix on the MXU in
  f32: every product is an integer ≤ 255 and every accumulated sum
  ≤ 255·65536 < 2^24, so the matmul is exact end-to-end
- per-tile partials accumulate into an int32 scratch revisited across
  sequential grid steps; every CARRY_EVERY tiles limbs carry-propagate
  so accumulators stay < 2^30 at any N
- the caller normalizes limb sums base-256 in pure int32, assembles the
  two words bitwise, and bitcasts to int64 — bit-identical to a
  sequential int64 sum whenever the true sum fits in int64 (unsigned-
  limb algebra is exact mod 2^64; SQL overflow is an error anyway).
  NO emulated int64 arithmetic appears after the split: the x64
  emulation pass in this toolchain miscompiles 64-bit shifts/multiplies
  inside large fused programs (measured twice: <<48 and ·2^16 dropped
  bits under jit while eager was exact)

Measured on the tunneled v5e at TPC-H Q1 shape (N=6M, K=9 int64 sum
vectors, 8 slots): 3.5 ms/op vs 4.8 ms/op for the XLA masked reduce,
amortized inside one program (PERF.md "Pallas grouped-sum kernel").

Enabled on TPU backends by default (`SET pallas_grouped_sum = 'off'|'on'|
'auto'`); CPU tests run the same kernel in interpreter mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 8192            # lane width of one block row
BLOCK_ROWS = 8          # sublane rows per block (min int32 tile height)
CARRY_EVERY = 32        # grid steps between carry propagations: each
                        # step adds < 2^24 per limb, so acc < 2^29
MAX_DOMAIN = 256        # same bound as ops.grouped.MASKED_REDUCE_LIMIT

# 'auto' = on when the default backend is TPU; toggled by
# SET pallas_grouped_sum (main/settings.py)
MODE = "auto"


def enabled() -> bool:
    if MODE == "off":
        return False
    if MODE == "on":
        return True
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(gid_ref, *refs, nseg: int, k: int):
    """One grid step: contract an (8, LANES) tile's limbs with the one-hot.

    refs = k low-word refs + k high-word refs + the output ref.
    """
    lo_refs, hi_refs = refs[:k], refs[k:2 * k]
    out_ref = refs[2 * k]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nseg, LANES), 0)
    acc = jnp.zeros((nseg, 8 * k), jnp.float32)
    for r in range(BLOCK_ROWS):
        # four 8-bit limbs per word; arithmetic shift then mask is exact
        # for negatives too (limb planes are the unsigned base-256 digits)
        rows = []
        for b in range(4):
            for j in range(k):
                x = lo_refs[j][r:r + 1, :]        # (1, LANES) int32
                rows.append(((x >> (8 * b)) & 255).astype(jnp.bfloat16))
        for b in range(4):
            for j in range(k):
                x = hi_refs[j][r:r + 1, :]
                rows.append(((x >> (8 * b)) & 255).astype(jnp.bfloat16))
        limbs = jnp.concatenate(rows, axis=0)     # (8K, LANES)

        g = gid_ref[r:r + 1, :]                   # (1, LANES) int32
        oh = (g == row_ids).astype(jnp.bfloat16)  # (nseg, LANES)
        acc = acc + jax.lax.dot_general(
            oh, limbs, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (nseg, 8K) exact ints
    out_ref[:, :] = out_ref[:, :] + acc.astype(jnp.int32)

    @pl.when((i % CARRY_EVERY) == CARRY_EVERY - 1)
    def _carry():
        # each limb sheds its excess over 8 bits to the next; the top
        # limb's carry has weight >= 2^64 and wraps out of int64 — drop
        for b in range(7):
            cur = out_ref[:, b * k:(b + 1) * k]
            c = cur >> 8
            out_ref[:, b * k:(b + 1) * k] = cur - (c << 8)
            nxt = out_ref[:, (b + 1) * k:(b + 2) * k]
            out_ref[:, (b + 1) * k:(b + 2) * k] = nxt + c
        top = out_ref[:, 7 * k:8 * k]
        out_ref[:, 7 * k:8 * k] = top & 255


def fits_vmem(nseg: int, k: int) -> bool:
    """Scoped-VMEM estimate for one grid step: (2k+1) double-buffered
    input blocks + the unrolled per-row one-hots (the dominant term at
    large nseg) + the f32 accumulator. Mosaic's scoped limit is 16MB;
    TPC-H Q9 at nseg=216, k=3 measured 21.9MB and failed AOT — beyond
    ~12MB the XLA masked reduce takes over instead."""
    if k <= 0:
        return True
    nseg_p = max(8, -(-nseg // 8) * 8)
    kk = min(k, 10)  # >10 vectors split recursively
    inputs = (2 * kk + 1) * BLOCK_ROWS * LANES * 4 * 2
    onehots = BLOCK_ROWS * nseg_p * LANES * 2
    acc = nseg_p * 8 * kk * 4 * 2
    return inputs + onehots + acc < 12 * 1024 * 1024


def grouped_sum_i64(dense, vectors, nseg: int):
    """Exact per-slot int64 sums of K pre-masked vectors.

    dense: (N,) integer slot ids; rows with id outside [0, nseg) are dead
    (their vector entries must already hold 0, as ops.grouped guarantees).
    vectors: list of (N,) int64.  Returns list of (nseg,) int64.
    """
    k = len(vectors)
    if k > 10:
        # 2k+1 double-buffered (8, LANES) operands must fit VMEM
        mid = k // 2
        return (grouped_sum_i64(dense, vectors[:mid], nseg)
                + grouped_sum_i64(dense, vectors[mid:], nseg))
    n = vectors[0].shape[0]
    nseg_p = max(8, -(-nseg // 8) * 8)
    block = BLOCK_ROWS * LANES
    grid = -(-n // block)
    pad = grid * block - n
    z = jnp.zeros((pad,), jnp.int32)

    def planes(v):
        v = v.astype(jnp.int64)
        lo = ((v << 32) >> 32).astype(jnp.int32)  # low word bits
        hi = (v >> 32).astype(jnp.int32)          # high word bits
        if pad:
            lo = jnp.concatenate([lo, z])
            hi = jnp.concatenate([hi, z])
        return (lo.reshape(BLOCK_ROWS * grid, LANES),
                hi.reshape(BLOCK_ROWS * grid, LANES))

    los, his = zip(*[planes(v) for v in vectors])
    gid = jnp.clip(dense.astype(jnp.int32), -1, nseg)
    if pad:
        gid = jnp.concatenate([gid, jnp.full((pad,), nseg, jnp.int32)])
    gid = gid.reshape(BLOCK_ROWS * grid, LANES)

    # the kernel is pure int32/bf16/f32; trace it with x64 OFF — under
    # global x64 the Mosaic toolchain rejects the program (i64 grid
    # index types fail to legalize)
    with jax.enable_x64(False):
        limb_sums = pl.pallas_call(
            partial(_kernel, nseg=nseg_p, k=k),
            grid=(grid,),
            in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * (2 * k + 1),
            out_specs=pl.BlockSpec((nseg_p, 8 * k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nseg_p, 8 * k), jnp.int32),
            interpret=_interpret(),
        )(gid, *los, *his)

    # base-256 carry normalization in pure int32, then assemble the two
    # words bitwise and reinterpret as int64 (see module docstring on why
    # no 64-bit arithmetic is allowed here)
    out = []
    for j in range(k):
        digits = []
        carry = jnp.zeros((nseg,), jnp.int32)
        for b in range(8):
            d = limb_sums[:nseg, b * k + j] + carry
            carry = d >> 8
            digits.append(d & 255)
        lo32 = (digits[0] | (digits[1] << 8) | (digits[2] << 16)
                | (digits[3] << 24))
        hi32 = (digits[4] | (digits[5] << 8) | (digits[6] << 16)
                | (digits[7] << 24))
        total = jax.lax.bitcast_convert_type(
            jnp.stack([lo32, hi32], axis=-1), jnp.int64)
        out.append(total)
    return out
