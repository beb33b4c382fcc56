"""Full driver-protocol simulation over EVERY query (not just the
driver's 50-slot gate): runs each queries() entry and, where an
oracle_sql() entry exists, compares rows + sorted-column schema +
order-insensitive values against DuckDB — the exact protocol the
round driver applies at sf0.01.

Usage:
    python tools/driver_sim.py [--sf /root/testdata/sf0.01]
                               [--cpus 32] [--first N]

Prints one JSON line: {"checked": N, "oracle_pass": N, "rows_only": N,
"failed": {...}, "slowest": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns),
                        kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


def to_pd(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--first", type=int, default=0,
                    help="limit to the first N queries (0 = all)")
    ap.add_argument("--names", default="",
                    help="comma-separated query names to check "
                         "(overrides --first)")
    args = ap.parse_args()

    import duckdb
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry
    qs, sqls = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                    f"'{os.path.join(args.sf, t)}.parquet')")

    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    else:
        names = list(qs)[:args.first] if args.first else list(qs)
    failed, times = {}, {}
    n_pass = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            got = canon(to_pd(qs[name](args.sf)))
            if name in sqls:
                exp = canon(con.execute(sqls[name]).fetchdf())
                if list(got.columns) != list(exp.columns):
                    failed[name] = "columns"
                elif len(got) != len(exp):
                    failed[name] = f"rows {len(got)} vs {len(exp)}"
                elif not got.equals(exp):
                    failed[name] = "values"
                else:
                    n_pass += 1
            else:
                n_rows_only += 1
        except Exception as ex:                       # noqa: BLE001
            failed[name] = f"ERR {type(ex).__name__}: {str(ex)[:120]}"
        times[name] = round(time.time() - t0, 2)
    print(json.dumps({
        "sf": args.sf,
        "checked": len(names),
        "oracle_pass": n_pass,
        "rows_only": n_rows_only,
        "failed": failed,
        "slowest": sorted(times.items(), key=lambda kv: -kv[1])[:6],
    }))
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
