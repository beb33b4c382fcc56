"""Mergeable KLL-style quantile sketch (Karnin–Lang–Liberty 2016,
public) — the approximate, unbounded-domain partner to the EXACT
histogram quantiles in stages/sketch.py: exact_quantiles needs a
bounded/bucketable value domain; the KLL sketch bounds MEMORY
(O(k·log(n/k)) items) for any real-valued stream and merges
associatively, which is what a 100-TB column profile actually needs.

Derandomized: compaction keeps alternating halves by a deterministic
per-level toggle instead of a coin flip — the sketch is reproducible
for a FIXED insertion order, and the rank-error guarantee holds with
the usual ε ≈ c/k constant (pinned empirically in tests/test_kll.py
against exact ranks on uniform, zipf, sorted and adversarial-merge
inputs). Results still depend on partition layout (any mergeable
approximate sketch's outputs do), so the driver query is rows-only,
like the HLL family.

Ray shape: one sketch per block inside map_batches (vectorized numpy
updates), serialized to a binary blob column; ONE fold of the tiny
blobs (driver-side, bounded by n_blocks × sketch size) and a final
quantile read-out.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_LEVELS = 64


class KLL:
    """Levelled compactor sketch over float64 values."""

    def __init__(self, k: int = 200):
        self.k = k
        self.levels = [np.zeros(0, dtype=np.float64)]
        self.n = 0
        self._toggle = 0

    def _cap(self, lvl: int) -> int:
        # geometrically shrinking capacities, floor 2
        c = int(self.k * (2.0 / 3.0) ** (len(self.levels) - 1 - lvl))
        return max(c, 2)

    def update(self, vals: np.ndarray) -> "KLL":
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        self.n += len(vals)
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compress()
        return self

    def _compress(self) -> None:
        while True:
            total = sum(len(lv) for lv in self.levels)
            budget = sum(self._cap(i) for i in range(len(self.levels)))
            if total <= budget:
                return
            for i, lv in enumerate(self.levels):
                if len(lv) > self._cap(i):
                    srt = np.sort(lv)
                    # deterministic alternating-offset compaction
                    keep = srt[self._toggle % 2::2]
                    self._toggle += 1
                    if i + 1 == len(self.levels):
                        if len(self.levels) >= _MAX_LEVELS:
                            # should be unreachable (n would exceed
                            # 2^64); guard anyway
                            self.levels[i] = keep
                            break
                        self.levels.append(np.zeros(0, np.float64))
                    self.levels[i] = np.zeros(0, dtype=np.float64)
                    self.levels[i + 1] = np.concatenate(
                        [self.levels[i + 1], keep])
                    break

    def merge(self, other: "KLL") -> "KLL":
        self.n += other.n
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compress()
        return self

    def _weighted(self):
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 1 << i, np.int64))
        if not items:
            return (np.zeros(0, np.float64), np.zeros(0, np.int64))
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, phi: float) -> float:
        """Value whose estimated rank is ⌈phi·n⌉."""
        it, wt = self._weighted()
        if len(it) == 0:
            return float("nan")
        cum = np.cumsum(wt)
        target = max(1, int(np.ceil(phi * cum[-1])))
        return float(it[np.searchsorted(cum, target)
                        if target <= cum[-1] else -1])

    def rank(self, v: float) -> float:
        """Estimated fraction of values ≤ v."""
        it, wt = self._weighted()
        if len(it) == 0:
            return 0.0
        cum = np.concatenate([[0], np.cumsum(wt)])
        return float(cum[np.searchsorted(it, v, side="right")]
                     / cum[-1])

    # --------------------------- serialization ---------------------------
    def to_bytes(self) -> bytes:
        parts = [struct.pack("<qqq", self.k, self.n, len(self.levels))]
        for lv in self.levels:
            parts.append(struct.pack("<q", len(lv)))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        k, n, nl = struct.unpack_from("<qqq", blob)
        sk = cls(k)
        sk.n = n
        sk.levels = []
        pos = 24
        for _ in range(nl):
            (ln,) = struct.unpack_from("<q", blob, pos)
            pos += 8
            sk.levels.append(np.frombuffer(
                blob, dtype=np.float64, count=ln, offset=pos).copy())
            pos += 8 * ln
        return sk


def kll_quantiles(ds, col: str, phis: list, k: int = 200):
    """Dataset → Dataset (phi, value): approximate quantiles of
    ``col`` via per-block KLL sketches + one tiny fold. The fold is
    bounded by n_blocks × sketch size (a few KB each) — the same
    documented small-side pattern as the HLL register fold."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        sk = KLL(k).update(
            batch[col].to_numpy(zero_copy_only=False))
        return pa.table({"blob": pa.array([sk.to_bytes()],
                                          pa.binary())})

    blobs = ds.map_batches(partial, batch_format="pyarrow")
    sk = KLL(k)
    for ref in blobs.to_arrow_refs():
        t = ray.get(ref)
        for b in t["blob"].to_pylist() if t.num_rows else []:
            sk.merge(KLL.from_bytes(b))
    return rd.from_arrow(pa.table({
        "phi": pa.array(list(phis), pa.float64()),
        "value": pa.array([sk.quantile(p) for p in phis],
                          pa.float64())}))
