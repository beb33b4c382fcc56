"""Corpus-wide exact unit dedup (CCNet/C4-style): split every document
into units (lines / paragraphs / sentences — any separator), keep only
the globally FIRST occurrence of each distinct unit, and reassemble
documents preserving original unit order. Documents whose every unit
was seen earlier vanish.

This is the paragraph-hash dedup step of public web-corpus pipelines
(CCNet, Wenzek et al. 2019; C4, Raffel et al. 2020) — the corpus-side
sibling of the reference's per-tile feature dedup (canonical-sort +
adjacent-equal drop, /root/reference/src/tile_data.cpp:60-103), lifted
from tile scope to corpus scope.

Shape (two exchanges of slim rows, no driver materialization):

1. explode — ``map_batches`` splits text into (doc_id, ord, unit, h)
   rows; ``h`` is a memoized fnv1a64 over each batch's dictionary of
   distinct units (repetitive corpora make the dictionary tiny).
2. first-occurrence — ``partitioned_rank`` over PARTITION BY (h, unit)
   ORDER BY (doc_id, ord): ONE global sort keyed by the int64 hash
   (unit string only breaks hash collisions), then per-block
   run-relative row numbers; ``rn == 1`` keeps the canonical
   occurrence. No groupby, no per-group tasks, giant unit runs stay
   parallel across blocks.
3. reassemble — hash-bucket by doc_id, one groupby, per-bucket
   vectorized rebuild: lexsort (doc_id, ord), ListArray from segment
   offsets, ``pc.binary_join`` (single C++ kernel joins every doc's
   kept units with the separator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .common import mix_bucket
from .dedup import _word_hash


def make_explode_fn(sep: str, id_col: str = "doc_id",
                    text_col: str = "text"):
    def explode(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch[text_col], sep).combine_chunks()
        offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_units = np.diff(offsets)
        doc = np.repeat(
            batch[id_col].to_numpy(zero_copy_only=False), n_units)
        total = int(n_units.sum())
        ordn = (np.arange(total, dtype=np.int64)
                - np.repeat(offsets[:-1], n_units))
        units = parts.values
        dic = units.dictionary_encode()
        dvals = [_word_hash(v) for v in dic.dictionary.to_pylist()]
        h = np.asarray(dvals, dtype=np.uint64)[
            dic.indices.to_numpy(zero_copy_only=False)] \
            if len(dvals) else np.empty(0, dtype=np.uint64)
        return pa.table({
            id_col: pa.array(doc, pa.int64()),
            "ord": pa.array(ordn, pa.int64()),
            "unit": units,
            "h": pa.array(h.astype(np.int64), pa.int64()),
        })
    return explode


def make_rebuild_fn(sep: str, id_col: str = "doc_id",
                    text_col: str = "text"):
    def rebuild(g: pa.Table) -> pa.Table:
        doc = g[id_col].to_numpy(zero_copy_only=False)
        ordn = g["ord"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ordn, doc))
        doc = doc[order]
        units = g["unit"].combine_chunks().take(pa.array(order))
        bounds = np.flatnonzero(doc[1:] != doc[:-1]) + 1
        offs = np.concatenate(([0], bounds, [len(doc)])).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), units)
        joined = pc.binary_join(lists, sep)
        return pa.table({id_col: pa.array(doc[offs[:-1]], pa.int64()),
                         text_col: joined})
    return rebuild


def dedup_units(docs_ds, sep: str = "\n", id_col: str = "doc_id",
                text_col: str = "text", num_buckets: int = 256):
    """Remove every non-first occurrence of each distinct unit corpus-
    wide; return a (id_col, text_col) dataset of rebuilt documents
    (documents with no surviving units are omitted)."""
    from .rank import partitioned_rank

    units = docs_ds.map_batches(make_explode_fn(sep, id_col, text_col),
                                batch_format="pyarrow")
    first = partitioned_rank(units, ["h", "unit"], [id_col, "ord"],
                             rn_col="rn").filter(expr="rn == 1")

    def bucket(batch: pa.Table) -> pa.Table:
        b = mix_bucket(batch[id_col].to_numpy(zero_copy_only=False),
                       num_buckets)
        return (batch.select([id_col, "ord", "unit"])
                     .append_column("bucket", pa.array(b, pa.int64())))

    return (first.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(make_rebuild_fn(sep, id_col, text_col),
                        batch_format="pyarrow"))
