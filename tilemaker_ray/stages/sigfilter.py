"""Significant-tags prefilter (M1) — declarative record filters.

Re-implements the reference's ``node_keys`` / ``way_keys`` filter
grammar (/root/reference/include/significant_tags.h:15-37,
src/significant_tags.cpp; applied before the UDF ever runs,
src/pbf_processor.cpp:64,104): a list of entries

    "key"          → accept when key present (any value)
    "key=value"    → accept when key has exactly this value
    "~key"         → reject when key present
    "~key=value"   → reject when key has this value

Semantics match the reference: if any positive entries exist, a record
must match at least one; negative entries always veto. Applied as a
single vectorized pyarrow mask per batch — rows the UDF never sees
cost one boolean op, not an extraction.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def parse_filter(entries: list) -> tuple:
    """→ (positives, negatives) as lists of (key, value-or-None)."""
    pos, neg = [], []
    for e in entries:
        target = neg if e.startswith("~") else pos
        e = e.lstrip("~")
        if "=" in e:
            k, v = e.split("=", 1)
            target.append((k, v))
        else:
            target.append((e, None))
    return pos, neg


def make_sigfilter_fn(entries: list):
    """map_batches body: keep rows passing the filter. Keys are column
    names (our tag-bag is columnar); a None value tests non-null —
    the exact analog of tag presence."""
    pos, neg = parse_filter(entries)

    def sig_filter(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        keep = pa.array([len(pos) == 0] * n, pa.bool_())
        for k, v in pos:
            if k not in batch.column_names:
                continue
            m = pc.is_valid(batch[k]) if v is None \
                else pc.equal(batch[k], pa.scalar(v))
            m = pc.fill_null(m, False)
            keep = pc.or_(keep, m)
        for k, v in neg:
            if k not in batch.column_names:
                continue
            m = pc.is_valid(batch[k]) if v is None \
                else pc.equal(batch[k], pa.scalar(v))
            m = pc.fill_null(m, False)
            keep = pc.and_(keep, pc.invert(m))
        return batch.filter(keep)

    return sig_filter
