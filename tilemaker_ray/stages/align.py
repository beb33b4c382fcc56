"""Smith–Waterman local alignment over word tokens — the scoring
stage behind copy detection: winnowing/copy_pairs surfaces CANDIDATE
pairs cheaply; this ranks them by their strongest locally aligned
passage (match +2, mismatch −1, gap −1, floor 0 — all int64, so
scores are exact and deterministic).

No reference analog (tilemaker is geometry-only); the pipeline-level
analog is MOSS-style plagiarism verification after fingerprint
blocking. The DP is evaluated anti-diagonal by anti-diagonal so each
step is one vectorized numpy max over the diagonal lane instead of a
Python cell loop; cost O(la·lb) per pair, run from map_batches over a
bounded candidate-pair list (pairs are the OUTPUT of the df-capped
copy-pair stage, so the quadratic work is bounded by construction).
"""

from __future__ import annotations

import numpy as np

MATCH = 2
MISMATCH = -1
GAP = -1


def sw_score(a: list, b: list) -> int:
    """Best local-alignment score between token sequences (ints or
    strings). Anti-diagonal vectorized; returns 0 for empty inputs."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    # dictionary-encode so equality is exact (no hash collisions)
    ids: dict = {}
    def enc(seq):
        out = np.empty(len(seq), dtype=np.int64)
        for k, x in enumerate(seq):
            v = ids.get(x)
            if v is None:
                v = len(ids)
                ids[x] = v
            out[k] = v
        return out
    av = enc(a)
    bv = enc(b)
    # H has (la+1) x (lb+1) cells; antidiagonal d holds cells
    # (i, d-i). Keep two previous diagonals.
    best = 0
    prev2 = np.zeros(1, dtype=np.int64)          # d-2 (length varies)
    prev1 = np.zeros(2, dtype=np.int64)          # d-1
    for d in range(2, la + lb + 1):
        ilo = max(1, d - lb)
        ihi = min(la, d - 1)
        if ilo > ihi:
            # only border cells on this diagonal
            cur = np.zeros(min(d, la, lb, la + lb - d) + 1,
                           dtype=np.int64)
            prev2, prev1 = prev1, cur
            continue
        i = np.arange(ilo, ihi + 1)
        j = d - i
        sub = np.where(av[i - 1] == bv[j - 1], MATCH, MISMATCH)
        # indices of neighbors within the stored diagonals:
        # diag d-1 stores cells i in [max(0, d-1-lb), min(la, d-1)]
        base1 = max(0, d - 1 - lb)
        up = prev1[i - base1]            # (i, j-1) -> gap in a
        left = prev1[i - 1 - base1]      # (i-1, j) -> gap in b
        base2 = max(0, d - 2 - lb)
        diag = prev2[i - 1 - base2]      # (i-1, j-1)
        cur_vals = np.maximum(
            0, np.maximum(diag + sub,
                          np.maximum(up + GAP, left + GAP)))
        if len(cur_vals):
            best = max(best, int(cur_vals.max()))
        # store diagonal d for cells i in [max(0, d-lb), min(la, d)]
        lo = max(0, d - lb)
        hi = min(la, d)
        cur = np.zeros(hi - lo + 1, dtype=np.int64)
        cur[i - lo] = cur_vals
        prev2, prev1 = prev1, cur
    return best


def sw_score_reference(a: list, b: list) -> int:
    """Plain O(la·lb) cell-loop reference (the pytest oracle)."""
    la, lb = len(a), len(b)
    H = [[0] * (lb + 1) for _ in range(la + 1)]
    best = 0
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            s = MATCH if a[i - 1] == b[j - 1] else MISMATCH
            v = max(0, H[i - 1][j - 1] + s, H[i - 1][j] + GAP,
                    H[i][j - 1] + GAP)
            H[i][j] = v
            best = max(best, v)
    return best
