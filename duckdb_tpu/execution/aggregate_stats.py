"""Statistical aggregates: covariance/correlation/regression, moments,
entropy, MAD.

The reference implements these as per-row Welford updates
(/root/reference/extension/core_functions/include/core_functions/aggregate/
algebraic/covar.hpp, corr.hpp; aggregate/regression/*.cpp;
aggregate/distributive/skew.cpp, kurtosis.cpp). The TPU formulation is
moment sums per group — Σx, Σx², Σxy, Σx³, Σx⁴ — computed in one fused
grouped reduction (f64 accumulators), then the reference's exact finalize
algebra on the (tiny) per-group state. NULL semantics mirror the
reference: pairwise aggregates skip rows where EITHER argument is NULL.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_tpu.blocks import Column
from duckdb_tpu.ops.grouped import grouped_reduce
from duckdb_tpu.types import BIGINT, DOUBLE, TypeId

_TWO_ARG = {
    "corr", "covar_pop", "covar_samp", "regr_slope", "regr_intercept",
    "regr_r2", "regr_count", "regr_avgx", "regr_avgy", "regr_sxx",
    "regr_syy", "regr_sxy",
}
_ONE_ARG = {"skewness", "kurtosis", "kurtosis_pop", "entropy", "sem", "mad",
            "count_if", "countif"}

STAT_AGGS = _TWO_ARG | _ONE_ARG


def _f64(c: Column, plen: int) -> jnp.ndarray:
    d = jnp.broadcast_to(c.data, (plen,))
    if c.ltype.id is TypeId.DECIMAL:
        out = d.astype(jnp.float64) / jnp.float64(10.0 ** c.ltype.scale)
    else:
        out = d.astype(jnp.float64)
    if c.data_hi is not None:
        # wide value = hi*2^64 + uint64(lo)
        s = jnp.float64(10.0 ** c.ltype.scale
                        if c.ltype.id is TypeId.DECIMAL else 1.0)
        out = out + jnp.where(d < 0, jnp.float64(2.0**64) / s, 0.0) \
            + jnp.broadcast_to(c.data_hi, d.shape).astype(jnp.float64) \
            * (jnp.float64(2.0**64) / s)
    return out


def compute_stat_agg(agg, c, data, mask, gids, nseg, plen, n_groups,
                     extra, key_data):
    """Dispatch one statistical aggregate → Column of (nseg-1,) values.

    gids: (plen,) group ids with nseg-1 == trash slot for dead rows.
    mask: live AND first-arg validity.
    """
    f = agg.func
    G = nseg - 1
    if f in ("count_if", "countif"):
        # reference count_if: NULL over zero non-NULL inputs (SUM-like)
        x = jnp.where(mask, data.astype(jnp.bool_), False)
        gg0 = jnp.where(mask, gids, G)
        d, n0 = grouped_reduce(gg0, [x.astype(jnp.int64),
                                     mask.astype(jnp.int64)],
                               ["sum", "sum"], G)
        return Column(data=d, ltype=BIGINT, validity=n0 > 0)

    if f in _TWO_ARG:
        # duckdb argument order: f(y, x)
        yc = c
        xc = extra[0]
        y = _f64(yc, plen)
        x = _f64(xc, plen)
        m = mask
        if xc.validity is not None:
            m = jnp.logical_and(m, jnp.broadcast_to(xc.validity, (plen,)))
        gg = jnp.where(m, gids, G)
        z = jnp.float64(0.0)
        xs = jnp.where(m, x, z)
        ys = jnp.where(m, y, z)
        n, sx, sy, sxx, syy, sxy = grouped_reduce(
            gg,
            [m.astype(jnp.int64), xs, ys, xs * xs, ys * ys, xs * ys],
            ["sum"] * 6, G)
        nf = n.astype(jnp.float64)
        safe_n = jnp.maximum(nf, 1.0)
        mx = sx / safe_n
        my = sy / safe_n
        # population co-moments (the reference's d² / co_moment state)
        cxy = sxy - sx * sy / safe_n
        cxx = sxx - sx * sx / safe_n
        cyy = syy - sy * sy / safe_n
        nonempty = n > 0
        if f == "regr_count":
            return Column(data=n, ltype=BIGINT)
        if f == "covar_pop":
            return Column(data=cxy / safe_n, ltype=DOUBLE, validity=nonempty)
        if f == "covar_samp":
            ok = n > 1
            return Column(data=cxy / jnp.maximum(nf - 1.0, 1.0),
                          ltype=DOUBLE, validity=ok)
        if f == "regr_avgx":
            return Column(data=mx, ltype=DOUBLE, validity=nonempty)
        if f == "regr_avgy":
            return Column(data=my, ltype=DOUBLE, validity=nonempty)
        if f == "regr_sxx":
            return Column(data=cxx, ltype=DOUBLE, validity=nonempty)
        if f == "regr_syy":
            return Column(data=cyy, ltype=DOUBLE, validity=nonempty)
        if f == "regr_sxy":
            return Column(data=cxy, ltype=DOUBLE, validity=nonempty)
        var_x = cxx / safe_n
        var_y = cyy / safe_n
        if f == "regr_slope":
            # single-point group: 0/0 → NaN, matching the reference's
            # unguarded division (regr_slope.cpp)
            return Column(data=cxy / cxx, ltype=DOUBLE, validity=nonempty)
        if f == "regr_intercept":
            slope = cxy / jnp.where(cxx == 0, 1.0, cxx)
            ok = jnp.logical_and(nonempty, var_x != 0)
            return Column(data=my - slope * mx, ltype=DOUBLE, validity=ok)
        denom = jnp.sqrt(var_x * var_y)
        corr = (cxy / safe_n) / denom  # 0/0 → NaN like the reference
        if f == "corr":
            return Column(data=corr, ltype=DOUBLE, validity=nonempty)
        if f == "regr_r2":
            # reference regr_r2.cpp: NULL when var_pop(x)==0; 1 when
            # var_pop(y)==0; else corr²  (var uses count>1 gate there)
            varx_g = jnp.where(n > 1, var_x, 0.0)
            vary_g = jnp.where(n > 1, var_y, 0.0)
            ok = varx_g != 0
            r2 = jnp.where(vary_g == 0, 1.0, corr * corr)
            return Column(data=r2, ltype=DOUBLE, validity=ok)
        raise AssertionError(f)

    x = _f64(c, plen)
    gg = jnp.where(mask, gids, G)
    z = jnp.float64(0.0)
    xs = jnp.where(mask, x, z)

    if f == "sem":
        n, sx, sxx = grouped_reduce(
            gg, [mask.astype(jnp.int64), xs, xs * xs], ["sum"] * 3, G)
        nf = n.astype(jnp.float64)
        safe_n = jnp.maximum(nf, 1.0)
        # reference sem.cpp: sqrt(population variance / n)
        var_pop = (sxx - sx * sx / safe_n) / safe_n
        d = jnp.sqrt(jnp.maximum(var_pop, 0.0)) / jnp.sqrt(safe_n)
        return Column(data=d, ltype=DOUBLE, validity=n > 0)

    if f == "skewness":
        n, sx, sxx, sxxx = grouped_reduce(
            gg, [mask.astype(jnp.int64), xs, xs * xs, xs * xs * xs],
            ["sum"] * 4, G)
        nf = n.astype(jnp.float64)
        safe_n = jnp.maximum(nf, 1.0)
        temp = 1.0 / safe_n
        raw_m2 = sxx - sx * sx * temp
        # reference skew.cpp: second-moment noise below eps·max(1,|Σx²|) → NULL
        noise = jnp.abs(raw_m2) <= np.finfo(np.float64).eps * jnp.maximum(
            1.0, jnp.abs(sxx))
        variance = temp * raw_m2
        p = variance * variance * variance
        div = jnp.sqrt(jnp.maximum(p, 1e-300))
        temp1 = jnp.sqrt(safe_n * jnp.maximum(nf - 1.0, 0.0)) / jnp.maximum(
            nf - 2.0, 1.0)
        val = temp1 * temp * (sxxx - 3 * sxx * sx * temp
                              + 2 * sx * sx * sx * temp * temp) / div
        ok = jnp.logical_and(n > 2, jnp.logical_and(~noise, variance > 0))
        return Column(data=val, ltype=DOUBLE, validity=ok)

    if f in ("kurtosis", "kurtosis_pop"):
        x2 = xs * xs
        n, sx, sxx, sxxx, sxxxx = grouped_reduce(
            gg, [mask.astype(jnp.int64), xs, x2, x2 * xs, x2 * x2],
            ["sum"] * 5, G)
        nf = n.astype(jnp.float64)
        safe_n = jnp.maximum(nf, 1.0)
        temp = 1.0 / safe_n
        m4 = temp * (sxxxx - 4 * sxxx * sx * temp
                     + 6 * sxx * sx * sx * temp * temp
                     - 3 * sx * sx * sx * sx * temp * temp * temp)
        m2 = temp * (sxx - sx * sx * temp)
        safe_m2 = jnp.where(m2 == 0, 1.0, m2)
        if f == "kurtosis_pop":
            val = m4 / (safe_m2 * safe_m2) - 3.0
            ok = jnp.logical_and(n > 1, m2 > 0)
        else:
            val = ((nf - 1.0) * ((nf + 1.0) * m4 / (safe_m2 * safe_m2)
                                 - 3.0 * (nf - 1.0))
                   / jnp.maximum((nf - 2.0) * (nf - 3.0), 1.0))
            ok = jnp.logical_and(n > 3, m2 > 0)
        return Column(data=val, ltype=DOUBLE, validity=ok)

    if f == "entropy":
        # -Σ (c_v/n)·log2(c_v/n) over per-(group, value) counts: sort by
        # (gid, value), count runs, reduce per gid (reference:
        # core_functions/aggregate/distributive/entropy.cpp)
        from duckdb_tpu.execution.aggregate_exec import _key_data

        kd = _key_data(c, plen)
        operands = [jnp.logical_not(mask), gids.astype(jnp.int32),
                    jnp.where(mask, kd, 0)]
        out = jax.lax.sort(operands, num_keys=3, is_stable=False)
        dead_s, gid_s, kd_s = out
        change = jnp.logical_or(gid_s != jnp.roll(gid_s, 1),
                                kd_s != jnp.roll(kd_s, 1))
        change = change.at[0].set(True)
        run_id = jnp.cumsum(change.astype(jnp.int32)) - 1
        run_len = jax.ops.segment_sum(
            jnp.where(dead_s, 0, 1), run_id, num_segments=plen)
        n, = grouped_reduce(gg, [mask.astype(jnp.int64)], ["sum"], G)
        nf = jnp.maximum(n.astype(jnp.float64), 1.0)
        # per run: contribution counted once (at run start)
        is_start = change
        cnt_v = jnp.where(jnp.logical_and(is_start, ~dead_s),
                          run_len[run_id].astype(jnp.float64), 0.0)
        gid_for = jnp.where(jnp.logical_and(is_start, ~dead_s),
                            gid_s, G)
        contrib = jnp.where(cnt_v > 0,
                            cnt_v * jnp.log2(jnp.maximum(cnt_v, 1.0)), 0.0)
        s_clogc, = grouped_reduce(gid_for, [contrib], ["sum"], G)
        ent = jnp.log2(nf) - s_clogc / nf
        # reference entropy.cpp: empty input yields 0.0, not NULL
        return Column(data=jnp.maximum(ent, 0.0), ltype=DOUBLE)

    if f == "mad":
        # median absolute deviation: median(|x - median(x)|) per group.
        # Two quantile passes (the reference's holistic MAD,
        # core_functions/aggregate/holistic/quantile.cpp)
        med = _group_quantile_f64(x, mask, gids, nseg, plen)
        dev = jnp.abs(x - med[jnp.clip(gids, 0, G)])
        d = _group_quantile_f64(dev, mask, gids, nseg, plen)
        n, = grouped_reduce(gg, [mask.astype(jnp.int64)], ["sum"], G)
        if c.ltype.id is TypeId.DECIMAL:
            # duckdb returns DECIMAL-typed MAD; we surface DOUBLE values
            pass
        return Column(data=d, ltype=DOUBLE, validity=n > 0)

    raise AssertionError(f)


def _group_quantile_f64(x, mask, gids, nseg, plen, q=0.5):
    """Interpolated per-group quantile of an f64 vector (sort-based)."""
    from duckdb_tpu.ops.sort import orderable_int64

    enc = orderable_int64(x, None, False, False)
    out = jax.lax.sort([jnp.logical_not(mask), gids.astype(jnp.int32),
                        jnp.where(mask, enc, 0)], num_keys=3,
                       is_stable=False)
    dead_s, gid_s, enc_s = out
    iota = jnp.arange(plen, dtype=jnp.int64)
    G = nseg - 1
    gg = jnp.where(mask, gids, G)
    cnt, = grouped_reduce(gg, [mask.astype(jnp.int64)], ["sum"], G)
    start = jax.ops.segment_min(jnp.where(dead_s, plen, iota), gid_s,
                                num_segments=nseg)[:-1]
    fpos = start.astype(jnp.float64) + (cnt - 1).astype(jnp.float64) * q
    lo_i = jnp.clip(jnp.floor(fpos).astype(jnp.int64), 0, plen - 1)
    hi_i = jnp.clip(jnp.ceil(fpos).astype(jnp.int64), 0, plen - 1)
    frac = fpos - jnp.floor(fpos)

    def dec(e):
        bits = jnp.where(e >= 0, e, ~(e ^ jnp.int64(np.iinfo(np.int64).min)))
        return jax.lax.bitcast_convert_type(bits, jnp.float64)

    lo_v = dec(enc_s[lo_i])
    hi_v = dec(enc_s[hi_i])
    return lo_v + (hi_v - lo_v) * frac
