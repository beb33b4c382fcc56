"""Mergeable-sketch aggregations: exact distributed quantiles.

No reference analog (tilemaker's aggregations are geometric); this is
the classic two-pass exact-quantile pattern a data engine needs at
scale: (1) one streaming pass builds per-block HISTOGRAM sketches
(fixed uniform bins over [min, max]) that merge by addition — the
driver merges kilobytes, never rows; (2) the target ranks map to bins,
and a single filtered pass gathers only the candidate bins' values
(≈ n/NB rows) for the exact order statistic. Matches DuckDB's
``quantile_disc`` exactly: k-th smallest with k = max(1, ceil(p·n)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

NB = 4096


def exact_quantiles(ds, col: str, ps: list,
                    interpolated: bool = False) -> pa.Table:
    """→ pa.Table (p, value) of exact quantiles of ``ds[col]`` (float
    column). Three distributed passes (stats, histogram, candidate
    gather — the bin domain genuinely needs global min/max first) over
    blocks cached by ``materialize()``, so the upstream read runs
    ONCE; plus O(NB + candidates) driver work.

    ``interpolated=False`` matches DuckDB ``quantile_disc`` (k-th
    smallest, k = max(1, ceil(p·n))); ``interpolated=True`` matches
    ``quantile_cont`` / ANSI PERCENTILE_CONT: rank r = p·(n−1)
    (0-based, fractional), value = v_lo·(hi−r) + v_hi·(r−lo) — the
    same expression DuckDB evaluates, so doubles are bit-identical."""
    from ray.data.aggregate import Count, Max, Min
    ds = ds.materialize()
    stats = ds.aggregate(Count(col, alias_name="n"),
                         Min(col, alias_name="mn"),
                         Max(col, alias_name="mx"))
    n = int(stats["n"])
    if n == 0:
        return pa.table({"p": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    mn, mx = float(stats["mn"]), float(stats["mx"])
    width = (mx - mn) / NB if mx > mn else 1.0

    def hist(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        b = np.clip(((v - mn) / width).astype(np.int64), 0, NB - 1)
        return pa.table({"counts": pa.array(
            [np.bincount(b, minlength=NB).tolist()],
            pa.list_(pa.int64()))})

    counts = np.zeros(NB, dtype=np.int64)
    for b in ds.map_batches(hist, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for row in b["counts"].to_pylist():
            counts += np.asarray(row, dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)])

    # target ranks (1-based k-th smallest) → bins
    if interpolated:
        rs = [p * (n - 1) for p in ps]           # 0-based fractional
        ks = sorted({int(np.floor(r)) + 1 for r in rs}
                    | {int(np.ceil(r)) + 1 for r in rs})
    else:
        ks = [max(1, int(np.ceil(p * n))) for p in ps]
    need_bins = sorted({int(np.searchsorted(cum, k, side="left")) - 1
                        for k in ks})

    def in_bins(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        b = np.clip(((v - mn) / width).astype(np.int64), 0, NB - 1)
        keep = np.isin(b, need_bins)
        return pa.table({col: pa.array(v[keep], pa.float64()),
                         "bin": pa.array(b[keep], pa.int64())})

    cand = pa.concat_tables(list(
        ds.map_batches(in_bins, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")))
    cv = cand[col].to_numpy(zero_copy_only=False)
    cb = cand["bin"].to_numpy(zero_copy_only=False)

    def kth(k: int) -> float:
        bi = int(np.searchsorted(cum, k, side="left")) - 1
        vals = np.sort(cv[cb == bi])
        return float(vals[k - int(cum[bi]) - 1])

    if interpolated:
        out_v = []
        for p, r in zip(ps, rs):
            lo, hi = int(np.floor(r)), int(np.ceil(r))
            vl = kth(lo + 1)
            if hi == lo:
                out_v.append(vl)
            else:
                # DuckDB's symmetric weighting: lo·(hi−r) + hi·(r−lo)
                out_v.append(vl * (hi - r) + kth(hi + 1) * (r - lo))
    else:
        out_v = [kth(k) for k in ks]
    return pa.table({"p": pa.array(ps, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def grouped_quantiles(ds, key: str, col: str, ps: list,
                      num_buckets: int = 256,
                      interpolated: bool = False):
    """Per-key exact quantiles → Dataset (key, p50-style columns).
    Groups hash into buckets; ONE lexsort per bucket serves every
    group in it (the repo's bucket pattern — group sizes are the
    per-key row counts, exact order statistics are cheap at that
    granularity; the corpus never materializes anywhere).
    ``interpolated`` switches from quantile_disc to quantile_cont
    semantics (DuckDB's symmetric weighting, bit-identical doubles)."""
    from .common import mix_bucket

    def bucket(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        return pa.table({key: pa.array(k, pa.int64()),
                         col: b[col],
                         "kbkt": pa.array(mix_bucket(k, num_buckets),
                                          pa.int64())})

    names = [f"p{int(round(p * 100)):02d}" for p in ps]

    def quant(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            cols = {key: pa.array([], pa.int64())}
            for nm in names:
                cols[nm] = pa.array([], pa.float64())
            return pa.table(cols)
        k = g[key].to_numpy(zero_copy_only=False)
        v = g[col].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))  # NaN (nulls) sort last within key
        k, v = k[order], v[order]
        new = np.ones(n, dtype=bool)
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        # quantile_disc semantics: NULLs are ignored — sizes count only
        # non-null values (they sort to the segment tail); a group that
        # is entirely null still emits its key with null quantiles
        sizes = np.add.reduceat((~np.isnan(v)).astype(np.int64), starts)
        cols = {key: pa.array(k[starts], pa.int64())}
        for p, nm in zip(ps, names):
            if interpolated:
                r = p * np.maximum(sizes - 1, 0)
                lo = np.floor(r).astype(np.int64)
                hi = np.ceil(r).astype(np.int64)
                vl = v[starts + np.minimum(lo, np.maximum(sizes - 1, 0))]
                vh = v[starts + np.minimum(hi, np.maximum(sizes - 1, 0))]
                picked = np.where(hi == lo, vl,
                                  vl * (hi - r) + vh * (r - lo))
            else:
                kk = np.maximum(1, np.ceil(p * sizes).astype(np.int64))
                picked = v[starts + kk - 1]
            picked = np.where(sizes > 0, picked, np.nan)
            cols[nm] = pa.array(picked, pa.float64(), from_pandas=True)
        return pa.table(cols)

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("kbkt").map_groups(quant, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# HyperLogLog: approximate COUNT(DISTINCT) as a mergeable sketch
# ---------------------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit finalizer (public splitmix64 constants) —
    uniform bits even for sequential ids."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(regs: np.ndarray, p: int) -> float:
    """Flajolet et al. estimator with small-range (linear counting)
    and 64-bit-hash large-range behavior (no 32-bit wraparound
    correction needed).

    The register sum Σ 2^(−reg) is computed EXACTLY as an integer
    numerator over 2^S (S = max rho), then one correctly-rounded
    int/int division — bit-identical under any summation order and
    reproducible by the SQL oracle (a float np.sum over the register
    array would round pairwise-summation-order-dependently)."""
    m = 1 << p
    S = 64 - p + 1                      # max rho
    ri = regs.astype(np.int64)
    counts = np.bincount(ri, minlength=S + 1)
    num = sum(int(c) << (S - r)
              for r, c in enumerate(counts.tolist()) if c)
    est = _hll_alpha(m) * m * m / (num / (1 << S))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(ri == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def _hll_rho(v: np.ndarray, p: int) -> tuple:
    """Hash values → (register index, rho) for a 2^p-register HLL.
    rho = 1-based leading-zero count of the left-aligned remaining
    64-p bits (+1), capped at 64-p+1. ONE implementation shared by the
    global and grouped sketches so their registers stay mergeable."""
    h = _splitmix64(v)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)      # remaining 64-p bits, left-aligned
    nz = rest != 0
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    fl = np.zeros(len(h), dtype=np.int64)
    # float64 rounds log2 of values just under 2^64 up to 64 —
    # clamp so the leading-zero count never goes negative
    fl[nz] = np.maximum(
        63 - np.floor(np.log2(rest[nz].astype(np.float64)))
        .astype(np.int64), 0)
    lz[nz] = fl[nz]
    return idx, (np.minimum(lz, 64 - p) + 1).astype(np.int8)


def hll_count_distinct(ds, col: str, p: int = 12):
    """Approximate distinct count of an int64 column (pre-hash strings
    with a fingerprint op first). Standard error ≈ 1.04/√2^p (~1.6% at
    p=12). Fully mergeable: each block emits its 2^p max-rank register
    array as ONE binary blob row; a single merge task folds
    n_blocks × 2^p bytes with np.maximum — no driver materialization,
    no shuffle. Returns a Dataset with one row
    (n_distinct_est float64, p int64)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        idx, rho = _hll_rho(v, p)
        regs = np.zeros(m, dtype=np.int8)
        np.maximum.at(regs, idx, rho)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.binary())})

    def merge(batch: pa.Table) -> pa.Table:
        blobs = batch["regs"].to_pylist()
        acc = np.zeros(m, dtype=np.int8)
        for b in blobs:
            acc = np.maximum(acc, np.frombuffer(b, dtype=np.int8))
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    def estimate(batch: pa.Table) -> pa.Table:
        regs = np.frombuffer(batch["regs"][0].as_py(), dtype=np.int8)
        return pa.table({
            "n_distinct_est": pa.array([hll_estimate(regs, p)],
                                       pa.float64()),
            "p": pa.array([p], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return (partials.repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None)
            .map_batches(estimate, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters (mergeable summaries) + exact verify pass
# ---------------------------------------------------------------------------

def _mg_compress(items: np.ndarray, counts: np.ndarray, m: int):
    """Misra–Gries reduction of an exact frequency table to ≤ m
    counters: subtract the (m+1)-th largest count from all, keep the
    positive ones. The compression error per summary is ≤ that
    subtracted value; merged summaries keep every item with true
    frequency > n/(m+1) (Agarwal et al., "Mergeable Summaries",
    PODS'12 — public result)."""
    if len(items) <= m:
        return items, counts
    order = np.argsort(counts, kind="stable")[::-1]
    delta = counts[order[m]]
    keep = order[:m]
    kc = counts[keep] - delta
    pos = kc > 0
    return items[keep][pos], kc[pos]


def heavy_hitters_topk(ds, col: str, m: int = 64, k: int = 10):
    """EXACT global top-k most frequent values, sketch-accelerated:

    Pass 1 streams per-batch exact counts compressed to m Misra–Gries
    counters; the driver folds the per-block summaries (bounded:
    blocks × m counters — kilobytes) and keeps the candidate set,
    which provably contains every value with frequency > n/(m+1).
    Pass 2 re-streams the source and counts ONLY the candidates
    exactly (broadcast set, per-batch bincount, tiny groupby-sum), so
    the returned top-k is exact whenever the k-th frequency exceeds
    n/(m+1) — size m to the corpus skew (the pytest asserts the
    guarantee holds before trusting the result). Ties: value asc.

    Never shuffles raw rows; both exchanges move ≤ m rows per block.
    """
    import ray
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def mg_partial(batch: pa.Table) -> pa.Table:
        arr = batch[col].combine_chunks() \
            if isinstance(batch[col], pa.ChunkedArray) else batch[col]
        vc = arr.value_counts()
        items = np.asarray(vc.field("values").to_pylist(), dtype=object)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        it, ct = _mg_compress(items, counts, m)
        # the null-item row ALWAYS carries this batch's row total —
        # a batch whose compression drops every counter (uniform
        # batch with > m distinct values) must still count toward n
        return pa.table({
            "item": pa.array(list(it) + [None], pa.string()),
            "cnt": pa.array(np.concatenate([ct, [0]]), pa.int64()),
            "tot": pa.array(
                np.concatenate([np.zeros(len(it), dtype=np.int64),
                                [int(counts.sum())]]), pa.int64())})

    summaries = ds.map_batches(mg_partial,
                               batch_format="pyarrow").to_pandas()
    n_total = int(summaries["tot"].sum())
    summaries = summaries[summaries["item"].notna()]
    # driver fold: sum per item, then one final MG compression
    agg = summaries.groupby("item")["cnt"].sum()
    items = np.asarray(agg.index.to_numpy(), dtype=object)
    counts = agg.to_numpy()
    cand_items, _ = _mg_compress(items, counts, m)
    cand = set(cand_items.tolist())
    cand_ref = ray.put(cand)
    guarantee_floor = n_total // (m + 1)

    def recount(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        arr = batch[col].combine_chunks() \
            if isinstance(batch[col], pa.ChunkedArray) else batch[col]
        # explicit string type: an empty candidate set (possible when
        # every batch is near-uniform with > m distinct values) would
        # otherwise build a null-typed value_set and is_in would raise
        mask = pc.is_in(arr, value_set=pa.array(sorted(cs),
                                                pa.string()))
        vc = arr.filter(mask).value_counts()
        return pa.table({
            "item": vc.field("values"),
            "c": pa.array(vc.field("counts").to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64())})

    exact = (ds.map_batches(recount, batch_format="pyarrow")
             .groupby("item").aggregate(Sum("c", alias_name="freq"))
             ).to_pandas()
    exact = exact.sort_values(["freq", "item"],
                              ascending=[False, True]).head(k)
    out = pa.table({
        "item": pa.array(exact["item"].tolist(), pa.string()),
        "freq": pa.array(exact["freq"].to_numpy(), pa.int64())})
    return out, guarantee_floor


def hll_grouped_distinct(ds, key_col: str, col: str, p: int = 12):
    """Approximate COUNT(DISTINCT col) PER GROUP — the grouped form of
    hll_count_distinct. Each batch emits one 2^p register blob per
    group present in it (pre-combined with np.maximum.at over a
    (groups × m) matrix); one groupby on the key merges blobs with a
    vectorized fold. Exchange volume is groups_per_block × 2^p bytes —
    independent of row count; the same mergeability argument as the
    global sketch, so the estimate is partition-invariant. Returns
    (key, n_distinct_est, p)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        key_type = keys.type
        v = batch[col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(
            np.asarray(keys.to_pylist(), dtype=object),
            return_inverse=True)
        idx, rho = _hll_rho(v, p)
        regs = np.zeros((len(uniq), m), dtype=np.int8)
        np.maximum.at(regs, (inv, idx), rho)
        # typed empty: an empty batch must not infer a null-typed key
        # column (schema mismatch at the groupby — memory pitfall)
        return pa.table({
            key_col: pa.array(list(uniq), key_type),
            "regs": pa.array([r.tobytes() for r in regs], pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        blobs = g["regs"].to_pylist()
        acc = np.frombuffer(blobs[0], dtype=np.int8).copy()
        for b in blobs[1:]:
            acc = np.maximum(acc, np.frombuffer(b, dtype=np.int8))
        return pa.table({
            key_col: g[key_col].slice(0, 1),
            "n_distinct_est": pa.array([hll_estimate(acc, p)],
                                       pa.float64()),
            "p": pa.array([p], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_col).map_groups(merge, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable approximate frequency table
# ---------------------------------------------------------------------------
# Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
# count-min sketch and its applications"). depth x width counter
# matrix; row r indexes items by splitmix64(fnv1a64(item) ^ seed_r).
# Counters are LINEAR in the input, so the distributed form is exactly
# a sum: each block emits its nonzero cells as (cell, count) rows, one
# groupby-sum merges them, and the <= depth*width merged rows are a
# bounded driver fold (same size story as the HLL register blobs).
# Point query = min over rows; estimates NEVER undercount.

CMS_DEPTH = 4
CMS_WIDTH = 2048
# row seeds: splitmix64 of small constants, fixed forever (a seed
# change silently invalidates persisted sketches)
_CMS_SEEDS = _splitmix64(np.arange(1, 65, dtype=np.uint64))


def cms_cells(word_hashes: np.ndarray, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> np.ndarray:
    """(depth, n) flat cell ids (row r's cells offset by r*width)."""
    wh = word_hashes.astype(np.uint64)
    rows = []
    for r in range(depth):
        idx = _splitmix64(wh ^ _CMS_SEEDS[r]) % np.uint64(width)
        rows.append(idx.astype(np.int64) + r * width)
    return np.stack(rows)


def cms_word_cells(ds, text_col: str = "text", depth: int = CMS_DEPTH,
                   width: int = CMS_WIDTH):
    """documents -> merged CMS cells: (cell:int64, n:int64), at most
    depth*width rows. Per-batch combiner: words dictionary-encode once,
    per-word counts go through bincount, and each block ships only its
    nonzero cells."""
    import pyarrow.compute as _pc
    from .dedup import _word_hash

    def partial(batch: pa.Table) -> pa.Table:
        flat = _pc.list_flatten(
            _pc.split_pattern(batch[text_col], " ")).combine_chunks()
        if len(flat) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "part_n": pa.array([], pa.int64())})
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vocab = enc.dictionary.to_pylist()
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        wh = np.fromiter((_word_hash(w) for w in vocab),
                         dtype=np.uint64, count=len(vocab))
        cells = cms_cells(wh, depth, width)          # (depth, V)
        mat = np.zeros(depth * width, dtype=np.int64)
        for r in range(depth):
            np.add.at(mat, cells[r], cnt)
        nz = np.flatnonzero(mat)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "part_n": pa.array(mat[nz], pa.int64())})

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cell")
            .aggregate(Sum("part_n", alias_name="n")))


def cms_matrix(cells_table: pa.Table, depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH) -> np.ndarray:
    """Merged (cell, n) rows -> dense (depth, width) matrix."""
    mat = np.zeros(depth * width, dtype=np.int64)
    cell = cells_table["cell"].to_numpy(zero_copy_only=False)
    n = cells_table["n"].to_numpy(zero_copy_only=False)
    mat[cell] = n
    return mat.reshape(depth, width)


def cms_estimate(mat: np.ndarray, word_hashes: np.ndarray,
                 width: int = CMS_WIDTH) -> np.ndarray:
    """Point-query estimates: min over rows (>= true count always)."""
    depth = mat.shape[0]
    cells = cms_cells(word_hashes, depth, width)
    ests = np.stack([mat.reshape(-1)[cells[r]] for r in range(depth)])
    return ests.min(axis=0)
