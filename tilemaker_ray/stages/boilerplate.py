"""Site-level boilerplate stripping (inter-document template removal,
CCNet-style; Wenzek et al. 2019 dedup their corpus at paragraph level
and public WET extractors drop per-site navigation/footer lines the
same way): a unit that occurs in more than ``num/den`` of a site's
documents is template, not content — strip it from EVERY document of
that site and reassemble the survivors in original order.

Differs from corpus-wide unit dedup (`linededup.py`): that keeps the
globally FIRST occurrence of each unit; this drops ALL occurrences of
units frequent WITHIN a site (the navigation-bar/footer signature),
keeps everything else, and thresholds on document frequency, exactly
(integer cross-multiplication ``dc * den > n_docs * num`` — no float).

Units are disjoint ``block_words``-token blocks of the space-joined
text (web pages with real newlines would pass sep="\\n" to the same
explode; the synthetic corpus is single-space text, so token blocks
are the unit grammar both engines share).

Shape — the broadcast pattern, no text ever shuffles:
1. ONE slim exchange: per-batch distinct (site, h, unit, doc) rows
   (a doc never spans batches, so per-batch distinct is exact) →
   groupby counts distinct docs per (site, unit).
2. The FREQUENT subset (bounded: a site's template is a few blocks ×
   n_sites, the classic small side) is collected and ``ray.put``
   once; per-site doc totals ride along.
3. One fused map pass re-explodes each batch, drops blocks in the
   broadcast set, and rebuilds documents in place — blocks never
   leave their batch. Fully-stripped documents are omitted.
At a scale where the frequent set outgrows the object store, swap
step 3 for the bucketed co-location join (`linededup.dedup_units`
shape); the threshold makes that regime unlikely (a block frequent in
>80% of a site's docs IS the template, and templates are small).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _word_hash


def explode_blocks(batch: pa.Table, block_words: int,
                   site_col: str = "source",
                   id_col: str = "doc_id",
                   text_col: str = "text"):
    """(doc, site, block_id, block_text, h) arrays for one batch —
    all offsets math, no per-row Python (the hash is memoized over the
    batch's dictionary of distinct blocks)."""
    toks = pc.split_pattern(batch[text_col], " ").combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = np.diff(offs)
    total = int(n_tok.sum())
    doc_of = np.repeat(np.arange(batch.num_rows), n_tok)
    pos = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1] - offs[0],
                                                       n_tok)
    # a block starts at every in-doc position divisible by block_words
    starts = np.flatnonzero(pos % block_words == 0)
    seg_offs = np.concatenate((starts, [total])).astype(np.int32)
    vals = toks.values
    if toks.offsets[0].as_py() != 0:
        vals = vals.slice(toks.offsets[0].as_py())
    lists = pa.ListArray.from_arrays(pa.array(seg_offs, pa.int32()),
                                     vals.slice(0, total))
    bt = pc.binary_join(lists, " ")
    doc_ix = doc_of[starts] if len(starts) else np.empty(0, np.int64)
    block_id = (pos[starts] // block_words) if len(starts) \
        else np.empty(0, np.int64)
    dic = bt.dictionary_encode()
    dvals = [_word_hash(v) for v in dic.dictionary.to_pylist()]
    h = (np.asarray(dvals, dtype=np.uint64)[
         dic.indices.to_numpy(zero_copy_only=False)].astype(np.int64)
         if dvals else np.empty(0, np.int64))
    doc = batch[id_col].to_numpy(zero_copy_only=False)[doc_ix]
    site = batch[site_col].combine_chunks() \
        if isinstance(batch[site_col], pa.ChunkedArray) \
        else batch[site_col]
    site_of = site.take(pa.array(doc_ix, pa.int64()))
    return doc, site_of, block_id, bt, h


def frequent_blocks(docs_ds, block_words: int, num: int, den: int,
                    site_col: str = "source", id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """The small side: (site, h, unit) rows whose distinct-doc count
    dc satisfies dc * den > n_docs(site) * num. One slim exchange;
    only the frequent subset reaches the driver."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        doc, site, _bid, bt, h = explode_blocks(
            batch, block_words, site_col, id_col, text_col)
        t = pa.table({"site": site, "h": pa.array(h, pa.int64()),
                      "unit": bt,
                      "doc": pa.array(doc, pa.int64())})
        # exact per-batch distinct (docs never span batches)
        g = t.group_by(["site", "h", "unit", "doc"]).aggregate([])
        return pa.table({"site": g["site"], "h": g["h"],
                         "unit": g["unit"],
                         "dc": pa.array(
                             np.ones(g.num_rows, np.int64), pa.int64())})

    counts = (docs_ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["site", "h", "unit"]).aggregate(Sum("dc")))

    site_tbl = (docs_ds.groupby(site_col).count().to_pandas())
    n_by_site = dict(zip(site_tbl[site_col], site_tbl["count()"]))

    def keep_frequent(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"site": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64()),
                             "unit": pa.array([], pa.string())})
        dc = batch["sum(dc)"].to_numpy(zero_copy_only=False)
        sdic = batch["site"].combine_chunks() \
            if isinstance(batch["site"], pa.ChunkedArray) \
            else batch["site"]
        sdic = sdic.dictionary_encode()
        per_site = np.asarray([n_by_site[s] for s in
                               sdic.dictionary.to_pylist()],
                              dtype=np.int64)
        nd = per_site[sdic.indices.to_numpy(zero_copy_only=False)]
        m = dc * den > nd * num
        out = batch.filter(pa.array(m))
        return out.select(["site", "h", "unit"])

    parts = [t for t in ray.get(list(
        counts.map_batches(keep_frequent, batch_format="pyarrow")
        .to_arrow_refs())) if t.num_rows > 0]
    if not parts:
        return pa.table({"site": pa.array([], pa.string()),
                         "h": pa.array([], pa.int64()),
                         "unit": pa.array([], pa.string())})
    return pa.concat_tables(parts)


def strip_boilerplate(docs_ds, block_words: int = 1,
                      num: int = 4, den: int = 5,
                      site_col: str = "source", id_col: str = "doc_id",
                      text_col: str = "text"):
    """Strip site-frequent blocks; return (id_col, text_col) of
    rebuilt docs (fully-stripped docs omitted). Default threshold:
    block in > 4/5 of the site's docs is template."""
    import ray

    freq = frequent_blocks(docs_ds, block_words, num, den,
                           site_col, id_col, text_col)
    # broadcast ONCE; membership key is the exact (site, unit) pair
    # (joined with NUL, which occurs in neither) — h only pre-filters,
    # so hash collisions cannot drop content
    fset = {f"{s}\x00{u}" for s, u in
            zip(freq["site"].to_pylist(), freq["unit"].to_pylist())}
    fref = ray.put(fset)

    def strip(batch: pa.Table) -> pa.Table:
        fs = ray.get(fref)
        doc, site, block_id, bt, h = explode_blocks(
            batch, block_words, site_col, id_col, text_col)
        if len(doc) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             text_col: pa.array([], pa.string())})
        if fs:
            # memoized membership: one Python check per DISTINCT
            # (site, unit) key in the batch, vectorized expansion
            key = pc.binary_join_element_wise(
                site, bt, "\x00").dictionary_encode()
            bad = np.fromiter((d in fs for d in
                               key.dictionary.to_pylist()),
                              dtype=bool,
                              count=len(key.dictionary))
            keep = ~bad[key.indices.to_numpy(zero_copy_only=False)]
        else:
            keep = np.ones(len(doc), dtype=bool)
        doc, block_id = doc[keep], block_id[keep]
        units = bt.filter(pa.array(keep))
        order = np.lexsort((block_id, doc))
        doc = doc[order]
        units = units.take(pa.array(order))
        bounds = np.flatnonzero(doc[1:] != doc[:-1]) + 1
        offs = np.concatenate(([0], bounds, [len(doc)])).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                         units)
        return pa.table({
            id_col: pa.array(doc[offs[:-1]], pa.int64()),
            text_col: pc.binary_join(lists, " ")})

    return docs_ds.map_batches(strip, batch_format="pyarrow")
