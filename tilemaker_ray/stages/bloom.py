"""Bloom-filter broadcast semi-join.

The J6 used-object semi-joins (stages/assembly.py) shuffle the big
side's distinct keys; at 100 TB the cheaper shape is: build a compact
Bloom filter of the SMALL side's keys (per-block partial bitmaps OR'd
on the driver — bounded by m_bits, not by rows), broadcast it once via
ray.put, and prefilter the big side inside map_batches so only
surviving rows (true matches + the ~(1-e^{-kn/m})^k false-positive
sliver) ever move. An exact bucketed verify against the real key set
removes the false positives, so results are oracle-exact — the filter
only cuts shuffle volume, never changes the answer.

All probe math is vectorized: two splitmix64-style hashes combined as
h1 + i*h2 (Kirsch–Mitzenmacher double hashing), bit ops on a packed
uint64 word array.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import mix_bucket

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray, salt: np.uint64) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + salt) * _C1
        x ^= x >> np.uint64(30)
        x *= _C2
        x ^= x >> np.uint64(27)
        x *= _C3
        x ^= x >> np.uint64(31)
    return x


def bloom_positions(keys: np.ndarray, m_bits: int, k_hashes: int):
    """(n, k) bit positions for each key."""
    x = np.asarray(keys).astype(np.uint64)
    h1 = _mix(x, np.uint64(0x1234))
    h2 = _mix(x, np.uint64(0xABCD)) | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)
    return pos


def bloom_build(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """Packed uint64 bitmap with all keys' bits set."""
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    pos = bloom_positions(keys, m_bits, k_hashes).ravel()
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_contains(words: np.ndarray, keys: np.ndarray, m_bits: int,
                   k_hashes: int) -> np.ndarray:
    """Vectorized membership probe (true = maybe present)."""
    pos = bloom_positions(keys, m_bits, k_hashes)
    bits = (words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def bloom_semi_join(big_ds, small_ds, big_key: str, small_key: str,
                    m_bits: int = 1 << 20, k_hashes: int = 5,
                    num_buckets: int = 64, verify: bool = True):
    """Rows of ``big_ds`` whose ``big_key`` appears in ``small_ds``'s
    ``small_key`` column. Bloom prefilter (broadcast) + exact bucketed
    verify over the survivors (union-groupby — schema-stable, no hash
    join)."""
    import ray

    # per-block partial bitmaps OR'd on the driver — the driver step is
    # bounded by m_bits (128 KB at 2^20), never by small-side rows
    def partial_bloom(b: pa.Table) -> pa.Table:
        w = bloom_build(b[small_key].to_numpy(zero_copy_only=False),
                        m_bits, k_hashes)
        return pa.table({"bloom": pa.array([w.tobytes()], pa.binary())})

    parts = [ray.get(r) for r in small_ds.map_batches(
        partial_bloom, batch_format="pyarrow").to_arrow_refs()]
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    for t in parts:
        if t.num_rows:
            for blob in t["bloom"].to_pylist():
                words |= np.frombuffer(blob, dtype=np.uint64)
    bloom_ref = ray.put(words)

    def prefilter(b: pa.Table) -> pa.Table:
        w = ray.get(bloom_ref)
        keys = b[big_key].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(
            bloom_contains(w, keys, m_bits, k_hashes)))

    survivors = big_ds.map_batches(prefilter, batch_format="pyarrow")
    if not verify:
        return survivors

    # exact verify: survivors ∪ small keys, bucketed by key; a survivor
    # row passes iff its bucket run contains a small-side key row
    def tag_big(b: pa.Table) -> pa.Table:
        keys = b[big_key].to_numpy(zero_copy_only=False)
        return (b.append_column("is_key", pa.array(
                    np.zeros(len(keys), np.int8), pa.int8()))
                 .append_column("vkey", pa.array(keys, pa.int64()))
                 .append_column("kbkt", pa.array(
                    mix_bucket(keys, num_buckets), pa.int64())))

    big_schema = survivors.schema().base_schema
    big_cols = [f.name for f in big_schema]

    def tag_small(b: pa.Table) -> pa.Table:
        keys = b[small_key].to_numpy(zero_copy_only=False)
        u = np.unique(keys)
        cols = {c: pa.nulls(len(u), big_schema.field(c).type)
                for c in big_cols}
        t = pa.table(cols)
        return (t.append_column("is_key", pa.array(
                    np.ones(len(u), np.int8), pa.int8()))
                 .append_column("vkey", pa.array(u, pa.int64()))
                 .append_column("kbkt", pa.array(
                    mix_bucket(u, num_buckets), pa.int64())))

    def verify_bucket(g: pa.Table) -> pa.Table:
        vkey = g["vkey"].to_numpy(zero_copy_only=False)
        is_key = g["is_key"].to_numpy(zero_copy_only=False)
        keep = (is_key == 0) & np.isin(vkey, vkey[is_key == 1])
        out = g.filter(pa.array(keep))
        return out.drop_columns(["is_key", "vkey", "kbkt"])

    return (survivors.map_batches(tag_big, batch_format="pyarrow")
            .union(small_ds.map_batches(tag_small,
                                        batch_format="pyarrow"))
            .groupby("kbkt").map_groups(verify_bucket,
                                        batch_format="pyarrow"))
