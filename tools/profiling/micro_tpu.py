"""TPU microbenchmarks: find which primitive ops pay the ~0.45s
serialized-stage cost on the tunneled runtime, and whether MXU one-hot
matmul segment reduction avoids it.

Run SOLO on the device (no other sessions). Sync via device_get — never
block_until_ready (a no-op on axon).

Usage: python tools/profiling/micro_tpu.py [case ...]
Cases: overhead scatter matmul gather sort bincount
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
import os

_cache = os.path.expanduser("~/.cache/duckdb_tpu_xla")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 6_000_640          # Q1-scale row count (multiple of BLK for reshapes)
NSEG = 64              # dense slot count (Q1 domain)
K = 12                 # aggregate columns
BLK = 256              # block size for exact f32 limb matmul
                       # (256 * 65535 < 2^24: f32 block sums stay exact)


def timed(fn, args, n=3, warmup=1):
    for _ in range(warmup):
        r = fn(*args)
        jax.device_get(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.device_get(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def report(name, secs, extra=""):
    print(f"{name:34s} {secs*1e3:10.1f} ms  {extra}", flush=True)


def main():
    cases = sys.argv[1:] or ["overhead", "scatter", "matmul", "gather",
                             "sort", "bincount"]
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, NSEG, N).astype(np.int32)
    vals_np = rng.integers(0, 100_000, (N, K)).astype(np.int64)
    fvals_np = rng.random((N,)).astype(np.float64)
    ids = jnp.asarray(ids_np)
    vals = jnp.asarray(vals_np)
    fvals = jnp.asarray(fvals_np)
    print(f"devices: {jax.devices()}", flush=True)

    if "overhead" in cases:
        @jax.jit
        def elementwise(v):
            return jnp.sum(v * 2 + 1, axis=0)

        t, _ = timed(elementwise, (vals,))
        report("elementwise 6Mx12 reduce", t)

        @jax.jit
        def tiny(x):
            return x + 1

        t, _ = timed(tiny, (jnp.ones((8,), jnp.int32),))
        report("tiny program (dispatch floor)", t)

    if "scatter" in cases:
        @jax.jit
        def seg1(ids, v):
            return jax.ops.segment_sum(v[:, 0], ids, num_segments=NSEG)

        t, _ = timed(seg1, (ids, vals))
        report("segment_sum 1 col (scatter)", t)

        @jax.jit
        def seg2d(ids, v):
            return jax.ops.segment_sum(v, ids, num_segments=NSEG)

        t, _ = timed(seg2d, (ids, vals))
        report("segment_sum 2D 12col (scatter)", t)

        @jax.jit
        def seg_chain(ids, v):
            a = jax.ops.segment_sum(v[:, 0], ids, num_segments=NSEG)
            b = jax.ops.segment_sum(v[:, 1] + a[ids], ids, num_segments=NSEG)
            return b

        t, _ = timed(seg_chain, (ids, vals))
        report("2 dependent scatters", t)

        big_ids = jnp.asarray(rng.integers(0, 1 << 22, N).astype(np.int32))

        @jax.jit
        def seg_big(ids, v):
            return jax.ops.segment_sum(v[:, 0], ids, num_segments=1 << 22)

        t, _ = timed(seg_big, (big_ids, vals))
        report("segment_sum 4M segments", t)

    if "matmul" in cases:
        # exact int64 segment-sum via one-hot f32 matmul over 16-bit limbs:
        # per 512-row block, one_hot(ids) @ limbs is exact in f32
        # (512*65535 < 2^24); block partials convert to int64 and tree-sum.
        @jax.jit
        def onehot_limb(ids, v):
            nb = N // BLK
            idb = ids.reshape(nb, BLK)
            oh = jax.nn.one_hot(idb, NSEG, dtype=jnp.float32)  # (nb,BLK,NSEG)
            out = []
            for limb in range(4):
                lv = ((v >> (16 * limb)) & 0xFFFF).astype(jnp.float32)
                lv = lv.reshape(nb, BLK, K)
                part = jnp.einsum("brs,brk->bsk", oh, lv,
                                  preferred_element_type=jnp.float32)
                out.append(part.astype(jnp.int64).sum(axis=0))
            r = out[0] + (out[1] << 16) + (out[2] << 32) + (out[3] << 48)
            return r

        t, r = timed(onehot_limb, (ids, vals))
        ref = np.zeros((NSEG, K), np.int64)
        np.add.at(ref, ids_np, vals_np)
        ok = np.array_equal(np.asarray(r), ref)
        report("one-hot limb matmul 12col", t, f"exact={ok}")

        # negative values exactness (two's-complement limb recombination)
        neg_np = rng.integers(-100_000, 100_000, (N, K)).astype(np.int64)
        negv = jnp.asarray(neg_np)
        _, r = timed(onehot_limb, (ids, negv), n=1)
        ref = np.zeros((NSEG, K), np.int64)
        np.add.at(ref, ids_np, neg_np)
        print(f"   negative-value exact={np.array_equal(np.asarray(r), ref)}",
              flush=True)

        @jax.jit
        def onehot_f32(ids, v):
            nb = N // BLK
            idb = ids.reshape(nb, BLK)
            oh = jax.nn.one_hot(idb, NSEG, dtype=jnp.float32)
            lv = v.astype(jnp.float32).reshape(nb, BLK, K)
            part = jnp.einsum("brs,brk->bsk", oh, lv)
            return part.astype(jnp.float64).sum(axis=0)

        t, _ = timed(onehot_f32, (ids, vals))
        report("one-hot f32 matmul (inexact)", t)

        # float64 exact-ish: hi/lo f32 split matmul
        @jax.jit
        def onehot_f64(ids, fv):
            nb = N // BLK
            idb = ids.reshape(nb, BLK)
            oh = jax.nn.one_hot(idb, NSEG, dtype=jnp.float32)
            hi = fv.astype(jnp.float32)
            lo = (fv - hi.astype(jnp.float64)).astype(jnp.float32)
            hvb = hi.reshape(nb, BLK)
            lvb = lo.reshape(nb, BLK)
            ph = jnp.einsum("brs,br->bs", oh, hvb)
            pl = jnp.einsum("brs,br->bs", oh, lvb)
            return (ph.astype(jnp.float64) + pl.astype(jnp.float64)).sum(axis=0)

        t, r = timed(onehot_f64, (ids, fvals))
        ref = np.zeros((NSEG,), np.float64)
        np.add.at(ref, ids_np, fvals_np)
        err = float(np.max(np.abs((np.asarray(r) - ref) / ref)))
        report("one-hot f64 hi/lo matmul", t, f"relerr={err:.2e}")

        # f64-accumulating einsum: does XLA TPU support it, and at what cost?
        @jax.jit
        def onehot_f64acc(ids, fv):
            nb = N // BLK
            idb = ids.reshape(nb, BLK)
            oh = jax.nn.one_hot(idb, NSEG, dtype=jnp.float32)
            hi = fv.astype(jnp.float32)
            lo = (fv - hi.astype(jnp.float64)).astype(jnp.float32)
            ph = jnp.einsum("brs,br->bs", oh, hi.reshape(nb, BLK),
                            preferred_element_type=jnp.float64)
            pl = jnp.einsum("brs,br->bs", oh, lo.reshape(nb, BLK),
                            preferred_element_type=jnp.float64)
            return (ph + pl).sum(axis=0)

        try:
            t, r = timed(onehot_f64acc, (ids, fvals))
            err = float(np.max(np.abs((np.asarray(r) - ref) / ref)))
            report("one-hot f64-acc einsum", t, f"relerr={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"one-hot f64-acc einsum failed: {e}", flush=True)

        # integer-limb decomposition of scaled f64: multiply by 2^26 and
        # split into int limbs? Instead: 3-way f32 split (hi, mid, lo)
        @jax.jit
        def onehot_f64_3way(ids, fv):
            nb = N // BLK
            idb = ids.reshape(nb, BLK)
            oh = jax.nn.one_hot(idb, NSEG, dtype=jnp.float32)
            hi = fv.astype(jnp.float32)
            rem = fv - hi.astype(jnp.float64)
            mid = rem.astype(jnp.float32)
            lo = (rem - mid.astype(jnp.float64)).astype(jnp.float32)
            out = 0.0
            for part in (hi, mid, lo):
                p = jnp.einsum("brs,br->bs", oh, part.reshape(nb, BLK))
                out = out + p.astype(jnp.float64).sum(axis=0)
            return out

        t, r = timed(onehot_f64_3way, (ids, fvals))
        err = float(np.max(np.abs((np.asarray(r) - ref) / ref)))
        report("one-hot f64 3-way matmul", t, f"relerr={err:.2e}")

    if "gather" in cases:
        lut = jnp.asarray(rng.integers(0, 1000, 1 << 22).astype(np.int32))
        big_ids = jnp.asarray(rng.integers(0, 1 << 22, N).astype(np.int32))

        @jax.jit
        def gath(lut, ids):
            return jnp.sum(lut[ids])

        t, _ = timed(gath, (lut, big_ids))
        report("gather 6M from 4M LUT", t)

        @jax.jit
        def gath_chain(lut, ids):
            a = lut[ids]
            b = lut[jnp.clip(a * 7 + 1, 0, (1 << 22) - 1)]
            c = lut[jnp.clip(b * 5 + 2, 0, (1 << 22) - 1)]
            return jnp.sum(c)

        t, _ = timed(gath_chain, (lut, big_ids))
        report("3 dependent gathers", t)

    if "sort" in cases:
        keys = jnp.asarray(rng.integers(0, 1 << 40, N))

        @jax.jit
        def sortn(k):
            s, p = jax.lax.sort([k, jnp.arange(N, dtype=jnp.int32)],
                                num_keys=1, is_stable=True)
            return s[0] + s[-1], p[0]

        t, _ = timed(sortn, (keys,))
        report("lax.sort 6M stable +iota", t)

        @jax.jit
        def ss(k, q):
            return jnp.sum(jnp.searchsorted(k, q))

        sorted_keys = jnp.sort(keys)
        jax.device_get(sorted_keys)
        t, _ = timed(ss, (sorted_keys, keys))
        report("searchsorted 6M in 6M", t)

    if "bincount" in cases:
        @jax.jit
        def bc(ids):
            return jnp.bincount(ids, length=NSEG)

        t, _ = timed(bc, (ids,))
        report("bincount 64 (scatter-based)", t)


if __name__ == "__main__":
    main()
