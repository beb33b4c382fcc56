"""Global ORDER BY … LIMIT k without a full sort exchange.

Per-block partial top-k (pyarrow ``sort_by`` + slice — C++ kernels,
any column types, per-key direction), then ONE merge task over the
surviving ≤ n_blocks × k slim rows.  That bound is the documented
driver-free analog of the reference's feature_limit per-tile top-k
(/root/reference/src/tile_data.cpp:60-103) lifted to the whole
corpus: at 10^5 blocks and k ≤ 10^3 the merge input is ≤ 10^8 slim
rows in the worst case — in practice partials rarely carry full k;
for larger k·n_blocks products, chain two rounds (``two_level=True``)
so each merge task sees at most ~√(n_blocks)·k rows.

The training-data use: deterministic hash-ordered corpus sampling
("ORDER BY h LIMIT k" with h mirrored in SQL) and score-based
retention ("keep the k highest-quality docs").
"""

from __future__ import annotations

import pyarrow as pa


def top_k(ds, keys, k: int, descending=False, two_level: bool = False):
    """keys: list of column names; ``descending`` a bool or per-key
    list. Returns a Dataset with ≤ k rows, NOT globally ordered (the
    rows are the global top-k set; order within is unspecified)."""
    if isinstance(keys, str):
        keys = [keys]
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    order = [(c, "descending" if d else "ascending")
             for c, d in zip(keys, descending)]

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        return batch.sort_by(order).slice(0, k)

    # batch_size=None → whole blocks: the merge stages MUST see their
    # entire block as one batch to emit exactly ≤ k rows
    partials = ds.map_batches(part, batch_format="pyarrow",
                              batch_size=None)
    if two_level:
        partials = (partials
                    .repartition(16)
                    .map_batches(part, batch_format="pyarrow",
                                 batch_size=None))
    return (partials.repartition(1)
            .map_batches(part, batch_format="pyarrow",
                         batch_size=None))
