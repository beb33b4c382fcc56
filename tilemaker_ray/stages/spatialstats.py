"""Global spatial-autocorrelation statistics over tile grids.

Moran's I over a z-level tile-count lattice with rook (4-neighbour)
contiguity weights — the standard first question a cartographer asks
of a choropleth the reference's tiles feed ("is the density clustered
or dispersed?"). Complements the per-tile pyramid/count queries with a
corpus-level statistic.

    I = (N / W) * [Σ_ij w_ij (x_i - x̄)(x_j - x̄)] / [Σ_i (x_i - x̄)²]

where the sums run over OCCUPIED tiles, w_ij = 1 iff tiles i and j are
rook-adjacent (both occupied), W = number of ordered adjacent pairs.

Distributed shape (the same scatter pattern as the hex k-ring kernel):
each occupied tile emits one occupant row keyed by its own cell and
four probe rows keyed by the rook neighbours; ONE hash aggregation per
cell yields, per key, the occupant count, the summed probe counts and
the probe multiplicity — from which every pairwise term of the
numerator reduces to per-cell products (occupant count is unique per
key). No per-group Python, no pair materialization: the exchange
volume is 5 rows per occupied tile regardless of corpus size. All
sufficient statistics are exact int64; the final division happens once
on six driver scalars through a fixed IEEE-double expression tree a
SQL oracle mirrors verbatim.

Grid adjacency does not wrap across the antimeridian (x = 0 vs
x = 2^z - 1), matching the flat XYZ tile-grid neighbourhood the
reference's tile walk uses. At extreme per-tile counts (≳2^31 events
per tile) the int64 cross sums would need a HUGEINT/fixed-point
upgrade; per-tile counts at the 10^12-row design point stay far below
that because z-level fan-out bounds tile occupancy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KEY_SHIFT = 21  # cell key = x << 21 | y
# coordinates are constrained to < 2^20 (zoom <= 20): the +-1 probe
# keys then can never wrap across the packed x|y boundary
_COORD_MAX = 1 << 20


def moran_scatter_fn(batch: pa.Table, x_col: str = "tile_x",
                     y_col: str = "tile_y",
                     n_col: str = "n_events") -> pa.Table:
    """Emit occupant + 4 rook-probe rows per occupied tile."""
    x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
    y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = batch[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(x) and (x.min() < 0 or y.min() < 0 or
                   x.max() >= _COORD_MAX or y.max() >= _COORD_MAX):
        raise ValueError("tile coordinates out of key range "
                         "(zoom <= 20 supported)")
    keys = [x * (1 << _KEY_SHIFT) + y]
    occ = [n]
    probe = [np.zeros(len(x), np.int64)]
    probe2 = [np.zeros(len(x), np.int64)]
    isp = [np.zeros(len(x), np.int64)]
    zero = np.zeros(len(x), np.int64)
    one = np.ones(len(x), np.int64)
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        keys.append((x + dx) * (1 << _KEY_SHIFT) + (y + dy))
        occ.append(zero)
        probe.append(n)
        probe2.append(n * n)
        isp.append(one)
    return pa.table({
        "cell": pa.array(np.concatenate(keys), pa.int64()),
        "occ": pa.array(np.concatenate(occ), pa.int64()),
        "probe": pa.array(np.concatenate(probe), pa.int64()),
        "probe2": pa.array(np.concatenate(probe2), pa.int64()),
        "isp": pa.array(np.concatenate(isp), pa.int64())})


def moran_cell_partials_fn(batch: pa.Table) -> pa.Table:
    """Per-cell pair partials from the aggregated scatter rows.

    Per cell: occ = x_j (0 if the cell is unoccupied), probe = Σ x_i
    over occupied rook neighbours, isp = neighbour multiplicity. The
    ordered-pair sums restricted to pairs whose BOTH endpoints are
    occupied are then per-cell products (probes only originate from
    occupied tiles, so the occ > 0 mask suffices)."""
    occ = batch["sum(occ)"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    probe = batch["sum(probe)"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    probe2 = batch["sum(probe2)"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    isp = batch["sum(isp)"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    m = (occ > 0).astype(np.int64)
    return pa.table({
        "a_part": pa.array(occ * probe, pa.int64()),
        "b_part": pa.array(m * (isp * occ + probe), pa.int64()),
        # Σ_ordered (x_i - x_j)²: per receiving cell j,
        # deg_j·x_j² + Σ x_i² - 2·x_j·Σ x_i
        "g_part": pa.array(m * (isp * occ * occ + probe2)
                           - 2 * occ * probe, pa.int64()),
        "w_part": pa.array(m * isp, pa.int64()),
        "d2_part": pa.array(m * isp * isp, pa.int64()),
        "s_part": pa.array(occ, pa.int64()),
        "ss_part": pa.array(occ * occ, pa.int64()),
        "n_part": pa.array(m, pa.int64())})


def moran_scalars(tile_counts, x_col: str = "tile_x",
                  y_col: str = "tile_y", n_col: str = "n_events"):
    """Reduce a tile-count Dataset to the six exact Moran sufficient
    statistics: (n_tiles, w_pairs, sum_x, sum_xx, cross_a, cross_b).

    cross_a = Σ_ordered-adjacent x_i·x_j, cross_b = Σ (x_i + x_j)."""
    from ray.data.aggregate import Sum

    scattered = tile_counts.map_batches(
        lambda b: moran_scatter_fn(b, x_col, y_col, n_col),
        batch_format="pyarrow")
    cells = scattered.groupby("cell").aggregate(
        Sum("occ"), Sum("probe"), Sum("probe2"), Sum("isp"))
    parts = cells.map_batches(moran_cell_partials_fn,
                              batch_format="pyarrow")
    agg = parts.aggregate(
        Sum("a_part"), Sum("b_part"), Sum("g_part"), Sum("w_part"),
        Sum("d2_part"), Sum("s_part"), Sum("ss_part"), Sum("n_part"))
    return {
        "n_tiles": int(agg["sum(n_part)"] or 0),
        "w_pairs": int(agg["sum(w_part)"] or 0),
        "sum_x": int(agg["sum(s_part)"] or 0),
        "sum_xx": int(agg["sum(ss_part)"] or 0),
        "cross_a": int(agg["sum(a_part)"] or 0),
        "cross_b": int(agg["sum(b_part)"] or 0),
        "cross_sq": int(agg["sum(g_part)"] or 0),
        "deg_sq": int(agg["sum(d2_part)"] or 0)}


def moran_finish(sc: dict) -> float | None:
    """IEEE-double Moran's I from the exact integer scalars. The
    expression tree is mirrored VERBATIM by the SQL oracle — operand
    order matters for bit-identity, do not refactor."""
    n, w = sc["n_tiles"], sc["w_pairs"]
    if n == 0 or w == 0:
        return None
    xbar = sc["sum_x"] / n
    den = sc["sum_xx"] - xbar * sc["sum_x"]
    if den == 0.0:
        return None
    num = sc["cross_a"] - xbar * sc["cross_b"] + xbar * xbar * w
    return (n / w) * (num / den)


def geary_finish(sc: dict) -> float | None:
    """IEEE-double Geary's C from the same exact integer scalars:
    C = (N-1)·Σ_ij w_ij (x_i-x_j)² / (2W·Σ(x_i-x̄)²). Mirrored
    verbatim by the SQL oracle — do not refactor the tree."""
    n, w = sc["n_tiles"], sc["w_pairs"]
    if n == 0 or w == 0:
        return None
    xbar = sc["sum_x"] / n
    den = sc["sum_xx"] - xbar * sc["sum_x"]
    if den == 0.0:
        return None
    # float(n-1) FIRST: Python's exact-bigint product would round
    # differently from SQL's double*double once past 2^53
    return (float(n - 1) * sc["cross_sq"]) / (2.0 * w) / den


def moran_significance(sc: dict, moran_i: float | None):
    """Analytic Moran significance under the normality null:
    E[I] = -1/(N-1); Var[I] = (N²·S1 - N·S2 + 3W²)/((N²-1)·W²) - E².
    Binary symmetric rook weights give S1 = 2W and S2 = 4·Σdeg²
    (deg_sq scalar). Returns (expected_i, z_moran); trees mirrored
    VERBATIM by the SQL oracle — do not refactor."""
    n, w = sc["n_tiles"], sc["w_pairs"]
    if moran_i is None or n < 3 or w == 0:
        return None, None
    e_i = -1.0 / (n - 1)
    var = ((n * n) * (2.0 * w) - n * (4.0 * sc["deg_sq"])
           + 3.0 * w * w) / ((n * n - 1.0) * (w * w)) - e_i * e_i
    if not var > 0.0:
        return e_i, None
    import math
    return e_i, (moran_i - e_i) / math.sqrt(var)


def lattice_edges(tile_counts, x_col: str = "tile_x",
                  y_col: str = "tile_y"):
    """Rook-adjacency edges between OCCUPIED tiles, as a Dataset of
    (doc_a, doc_b) packed cell keys — input for the connected-
    components engine (percolation clusters / urban blobs).

    Vectorized derivation with ONE hash aggregation and no pair
    materialization beyond the edges themselves: each occupied cell
    emits an occupant marker at its own key plus one probe at its +x
    and +y neighbour; after the per-key Sum, a cell that is BOTH
    occupied and probed reconstructs each edge endpoint from key
    arithmetic alone (probe direction is encoded in which counter
    fired), so probes never carry their source."""
    from ray.data.aggregate import Sum

    def scatter(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(x) and (x.min() < 0 or y.min() < 0 or
                       x.max() >= _COORD_MAX or
                       y.max() >= _COORD_MAX):
            raise ValueError("tile coordinates out of key range "
                             "(zoom <= 20 supported)")
        key = x * (1 << _KEY_SHIFT) + y
        zero = np.zeros(len(x), np.int64)
        one = np.ones(len(x), np.int64)
        return pa.table({
            "cell": pa.array(np.concatenate(
                [key, key + (1 << _KEY_SHIFT), key + 1]), pa.int64()),
            "occ": pa.array(np.concatenate([one, zero, zero]),
                            pa.int64()),
            "px": pa.array(np.concatenate([zero, one, zero]),
                           pa.int64()),
            "py": pa.array(np.concatenate([zero, zero, one]),
                           pa.int64())})

    def edges(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        occ = batch["sum(occ)"].to_numpy(zero_copy_only=False)
        px = batch["sum(px)"].to_numpy(zero_copy_only=False)
        py = batch["sum(py)"].to_numpy(zero_copy_only=False)
        m = occ > 0
        ex = cell[m & (px > 0)]
        ey = cell[m & (py > 0)]
        a = np.concatenate([ex, ey])
        b = np.concatenate([ex - (1 << _KEY_SHIFT), ey - 1])
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    return (tile_counts.map_batches(scatter, batch_format="pyarrow")
            .groupby("cell").aggregate(Sum("occ"), Sum("px"),
                                       Sum("py"))
            .map_batches(edges, batch_format="pyarrow"))


def gi_star_cells(tile_counts, x_col: str = "tile_x",
                  y_col: str = "tile_y", n_col: str = "n_events"):
    """Per-cell Getis–Ord Gi* inputs over the occupied-tile universe:
    (tile_x, tile_y, x_i, s_i, k_i) where s_i = Σ x_j over the rook
    neighbourhood INCLUDING self and k_i = its cell count. One scatter
    exchange (the Moran kernel's aggregation reused); the caller
    finishes with the global scalars through the mirrored IEEE tree
    (sqrt is IEEE-correctly-rounded, so numpy and SQL agree bitwise).
    """
    from ray.data.aggregate import Sum

    scattered = tile_counts.map_batches(
        lambda b: moran_scatter_fn(b, x_col, y_col, n_col),
        batch_format="pyarrow")
    cells = scattered.groupby("cell").aggregate(
        Sum("occ"), Sum("probe"), Sum("probe2"), Sum("isp"))

    def unpack(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        occ = batch["sum(occ)"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        probe = batch["sum(probe)"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        isp = batch["sum(isp)"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = occ > 0
        cell, occ, probe, isp = cell[m], occ[m], probe[m], isp[m]
        return pa.table({
            "tile_x": pa.array(cell >> _KEY_SHIFT, pa.int64()),
            "tile_y": pa.array(cell & ((1 << _KEY_SHIFT) - 1),
                               pa.int64()),
            "x_i": pa.array(occ, pa.int64()),
            "s_i": pa.array(occ + probe, pa.int64()),
            "k_i": pa.array(1 + isp, pa.int64())})

    return cells.map_batches(unpack, batch_format="pyarrow")


def gi_star_finish_fn(batch: pa.Table, n: int, sum_x: int,
                      sum_xx: int) -> pa.Table:
    """Append the Gi* z-score column. The expression tree is mirrored
    VERBATIM by the SQL oracle — operand order matters, do not
    refactor. Denominator degenerates (NULL) when k_i = N or the
    variance is 0."""
    s_i = batch["s_i"].to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    k_i = batch["k_i"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if n == 0:
        return batch.append_column(
            "gi_star", pa.array([None] * len(batch), pa.float64()))
    xbar = sum_x / n
    s = np.sqrt(sum_xx / n - xbar * xbar)
    kf = k_i.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        den = s * np.sqrt((n * kf - kf * kf) / (n - 1.0))
        gi = (s_i - xbar * kf) / den
    gi = np.where(den > 0.0, gi, np.nan)
    out = batch.append_column(
        "gi_star", pa.array(gi, pa.float64(),
                            mask=~(den > 0.0)))
    return out
