"""Distributed rolling-frame window aggregates:

    AGG(x) OVER (PARTITION BY p ORDER BY o
                 ROWS BETWEEN k PRECEDING AND CURRENT ROW)

Built directly on the LAG edge-buffer machinery (stages/shift.py):
one global sort, then each row's frame is reconstructed from its k
lag columns — a shift that crosses a partition boundary (or the
corpus start) comes back null, which is exactly "that row is outside
the frame".  The combine step is k+1 vectorized passes per aggregate
(k is the frame size, a small constant), null-aware:

    count = Σ valid over the k+1 frame slots   (COUNT(x))
    sum   = Σ zero-filled frame slots
    min   = fmin over NaN-masked slots          (NaN-ignoring)
    max   = fmax over NaN-masked slots
    avg   = sum / count                         (double division)

Exactness: SUM over doubles is order-sensitive; for oracle-exact
results feed an integer column (e.g. cents = floor(value*100)) — the
int64 adds are associative so any evaluation order matches the SQL
engine bit-for-bit.  MIN/MAX/COUNT are order-free for any dtype.
Float NaN is treated as missing (a null int that travelled through a
lag column arrives as float NaN — numpy has no null ints).

Scale: identical to stages/shift.py — driver state is a 2k-row edge
buffer per block, every block task is independent, a partition
spanning many blocks stays parallel.  The reference has no window
frames; the tiling analog is its per-tile running feature order
(/root/reference/src/tile_data.cpp:60-103) — here the need is
corpus-wide (per-user rolling activity for sessionized webtext).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .shift import shifted

_FNS = ("sum", "min", "max", "count", "avg")


def rolling_frame(ds, part_keys, order_keys, k: int, specs,
                  descending=False):
    """``specs``: list of (out_col, value_col, fn) with fn in
    sum/min/max/count/avg.  Frame = ROWS BETWEEN k PRECEDING AND
    CURRENT ROW within PARTITION BY part_keys ORDER BY order_keys."""
    for _o, _v, fn in specs:
        if fn not in _FNS:
            raise ValueError(f"unknown rolling fn {fn!r}")
    vcols = list(dict.fromkeys(v for _o, v, _f in specs))
    shifts = [(f"__lag{j}_{v}", v, j)
              for v in vcols for j in range(1, k + 1)]
    shifted_ds = shifted(ds, part_keys, order_keys, shifts,
                         descending=descending)

    def _filled(col):
        """(zero-filled numpy values, validity mask); float NaN counts
        as missing — the all-valid int path stays exact int64."""
        a = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if a.dtype.kind == "f":
            nan = np.isnan(a)
            if nan.any():
                valid = valid & ~nan
                a = np.where(valid, a, 0)
        return a, valid

    def combine(t: pa.Table) -> pa.Table:
        frames = {
            v: [_filled(t[v])] +
               [_filled(t[f"__lag{j}_{v}"]) for j in range(1, k + 1)]
            for v in vcols}
        cols = {}
        for out, v, fn in specs:
            parts = frames[v]
            if fn in ("count", "sum", "avg"):
                c = parts[0][1].astype(np.int64)
                for _a, vd in parts[1:]:
                    c = c + vd.astype(np.int64)
                if fn == "count":
                    cols[out] = pa.array(c, pa.int64())
                    continue
                s = parts[0][0].copy()
                for a, _vd in parts[1:]:
                    s = s + a
                if fn == "sum":
                    # SQL SUM over an all-null frame is NULL, not 0
                    cols[out] = pa.array(s, t[v].type).cast(t[v].type) \
                        if bool((c > 0).all()) else \
                        pa.array(np.asarray(s), t[v].type, mask=c == 0)
                else:
                    with np.errstate(invalid="ignore", divide="ignore"):
                        cols[out] = pa.array(
                            np.where(c > 0,
                                     s.astype(np.float64) / c, np.nan),
                            pa.float64(), from_pandas=True)
            else:  # min / max
                red = np.fmin if fn == "min" else np.fmax
                acc = None
                for a, vd in parts:
                    b = np.where(vd, a.astype(np.float64), np.nan)
                    acc = b if acc is None else red(acc, b)
                cols[out] = pa.array(acc, pa.float64(), from_pandas=True)
        keep = [c for c in t.column_names if not c.startswith("__lag")]
        base = t.select(keep)
        for name, arr in cols.items():
            base = base.append_column(name, arr)
        return base

    return shifted_ds.map_batches(combine, batch_format="pyarrow")
