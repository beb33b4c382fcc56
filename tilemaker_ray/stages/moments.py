"""Distributed grouped numeric moments: COUNT/AVG/VAR/STDDEV/CORR.

The naive distributed route (per-partition Welford, float merge) gives
answers that depend on partition boundaries and summation order —
unacceptable for a engine whose correctness gate is hash-exact
equality against a single-process oracle. Instead the classic
sufficient-statistics decomposition is computed on SCALED INTEGERS:

    n, Σx, Σx², Σy, Σy², Σxy      (x, y pre-scaled to int64)

Integer addition is associative and commutative, so the partial sums
are bit-identical under ANY partitioning — the same trick the engine's
KMeans (stages/cluster.py) and revenue queries use. The float
statistics are then derived once per group, on the driver-visible
final table, with a FIXED expression tree that the SQL oracle mirrors
verbatim (both engines do the identical IEEE-double ops on identical
integers, so even the last ulp matches):

    avg      = (Σx / scale) / n
    var_samp = (Σx² - Σx·Σx/n) / (n-1)          [in scaled units²]
    stddev   = sqrt(var_samp) / scale
    corr     = (n·Σxy - Σx·Σy) /
               (sqrt(n·Σx² - Σx·Σx) · sqrt(n·Σy² - Σy·Σy))
               (scale factors cancel)

Overflow bounds (documented, not silent): per-batch Σx² for a value
scaled to |v| ≤ V is ≤ V²·batch_rows; the global group sum must stay
< 2⁶³ ≈ 9.2e18. Callers pick `scale` so V²·group_rows is in range —
e.g. quantity cents (V=5000) supports 3.7e11 rows per group. The
combiner emits one row per (group, batch), so the exchange is slim.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_moments(ds, group_col: str, x_col: str, y_col: str,
                    x_scale: float = 100.0, y_scale: float = 100.0):
    """Dataset → one row per group: n, sx, sx2, sy, sy2, sxy (int64,
    x/y floored to x_scale/y_scale fixed-point)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            batch[group_col].combine_chunks()
            if isinstance(batch[group_col], pa.ChunkedArray)
            else batch[group_col])
        inv = enc.indices.to_numpy(zero_copy_only=False)
        keys = enc.dictionary
        xf = batch[x_col].to_numpy(zero_copy_only=False) * x_scale
        yf = batch[y_col].to_numpy(zero_copy_only=False) * y_scale
        # a null/NaN would cast to INT64_MIN and silently corrupt
        # every moment for its group (diverging from SQL's
        # null-skipping SUM) — fail loudly instead; callers must
        # drop nulls upstream if the column can carry them
        if np.isnan(xf).any() or np.isnan(yf).any():
            raise ValueError(
                f"grouped_moments: null/NaN in {x_col!r}/{y_col!r}; "
                "drop nulls before the fixed-point cast")
        x = np.floor(xf).astype(np.int64)
        y = np.floor(yf).astype(np.int64)
        k = len(keys)
        # int64 add.at, NOT bincount(weights=) — bincount accumulates
        # in float64 and loses exactness past 2^53
        out = {"n": np.bincount(inv, minlength=k).astype(np.int64)}
        for name, v in (("sx", x), ("sx2", x * x), ("sy", y),
                        ("sy2", y * y), ("sxy", x * y)):
            acc = np.zeros(k, dtype=np.int64)
            np.add.at(acc, inv, v)
            out[name] = acc
        cols = {group_col: keys}
        for name in ("n", "sx", "sx2", "sy", "sy2", "sxy"):
            cols[name] = pa.array(out[name], pa.int64())
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sx", alias_name="sx"),
                       Sum("sx2", alias_name="sx2"),
                       Sum("sy", alias_name="sy"),
                       Sum("sy2", alias_name="sy2"),
                       Sum("sxy", alias_name="sxy")))


def zscore_normalize(ds, moments_ds, group_col: str, x_col: str,
                     x_scale: float = 100.0, id_cols: list = (),
                     out_col: str = "z"):
    """Per-group z-score feature normalization — the training-data
    feature-scaling pass. Two-pass broadcast pattern: the tiny
    per-group moment table (one row per group) is collected and
    broadcast via ``ray.put``; the second streaming pass maps every
    row to (x - mean)/stddev with a FIXED expression tree (the SQL
    oracle mirrors it):

        xq   = floor(x·scale)/scale                (quantized input)
        mean = (CAST(sx AS DOUBLE)/scale)/n
        std  = sqrt((sx2 - sx·sx/n)/(n-1))/scale   (sample stddev)
        z    = (xq - mean)/std

    No shuffle in the normalization pass; group count bounds driver
    memory (6 int64 per group)."""
    import ray

    stats = moments_ds.to_pandas()
    lut = {}
    for r in stats.itertuples():
        n, sx, sx2 = float(r.n), float(r.sx), float(r.sx2)
        mean = sx / x_scale / n
        std = np.sqrt((sx2 - sx * sx / n) / (n - 1.0)) / x_scale
        lut[getattr(r, group_col)] = (mean, std)
    lut_ref = ray.put(lut)

    cols = [group_col, x_col] + list(id_cols)

    def norm(batch: pa.Table) -> pa.Table:
        m = ray.get(lut_ref)
        enc = pc.dictionary_encode(
            batch[group_col].combine_chunks()
            if isinstance(batch[group_col], pa.ChunkedArray)
            else batch[group_col])
        inv = enc.indices.to_numpy(zero_copy_only=False)
        keys = enc.dictionary.to_pylist()
        means = np.asarray([m[k][0] for k in keys])[inv]
        stds = np.asarray([m[k][1] for k in keys])[inv]
        xq = np.floor(batch[x_col].to_numpy(zero_copy_only=False)
                      * x_scale) / x_scale
        z = (xq - means) / stds
        out = {c: batch[c] for c in cols}
        out[out_col] = pa.array(z, pa.float64())
        return pa.table(out)

    return ds.map_batches(norm, batch_format="pyarrow")


def moment_stats(moments_ds, group_col: str, x_scale: float = 100.0,
                 names: tuple = ("avg_x", "stddev_x", "corr_xy")):
    """Final float statistics from the integer moments, fixed
    expression tree (mirrored by the SQL oracle — see module doc)."""
    avg_name, std_name, corr_name = names

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = batch["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx2 = batch["sx2"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = batch["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy2 = batch["sy2"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = batch["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        avg_x = sx / x_scale / n
        var_x = (sx2 - sx * sx / n) / (n - 1.0)
        std_x = np.sqrt(var_x) / x_scale
        corr = (n * sxy - sx * sy) / (
            np.sqrt(n * sx2 - sx * sx) * np.sqrt(n * sy2 - sy * sy))
        return pa.table({
            group_col: batch[group_col],
            "n": batch["n"],
            avg_name: pa.array(avg_x, pa.float64()),
            std_name: pa.array(std_x, pa.float64()),
            corr_name: pa.array(corr, pa.float64())})

    return moments_ds.map_batches(finish, batch_format="pyarrow")


def regression_stats(moments_ds, group_col: str,
                     x_scale: float = 100.0, y_scale: float = 100.0,
                     names: tuple = ("slope", "intercept", "cov_xy")):
    """Per-group simple linear regression y ~ x (OLS closed form) and
    sample covariance from the SAME integer sufficient statistics as
    moment_stats — distributed training of a one-feature linear model
    without any gradient iteration. Fixed expression trees (mirrored
    by the SQL oracle; scales enter exactly once each):

        slope_q   = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)   [quantized]
        slope     = slope_q · (x_scale / y_scale)⁻¹ … expressed as
                    slope_q * x_scale / y_scale
        intercept = (Σy/y_scale − slope·(Σx/x_scale)) / n
        cov_xy    = (Σxy − Σx·Σy/n) / (n−1) / x_scale / y_scale
    """
    slope_name, icept_name, cov_name = names

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = batch["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx2 = batch["sx2"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = batch["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = batch["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        slope_q = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
        slope = slope_q * x_scale / y_scale
        icept = (sy / y_scale - slope * (sx / x_scale)) / n
        cov = (sxy - sx * sy / n) / (n - 1.0) / x_scale / y_scale
        return pa.table({
            group_col: batch[group_col],
            "n": batch["n"],
            slope_name: pa.array(slope, pa.float64()),
            icept_name: pa.array(icept, pa.float64()),
            cov_name: pa.array(cov, pa.float64())})

    return moments_ds.map_batches(finish, batch_format="pyarrow")
