"""Physical data layout: range-clustered parquet writes + measured row-group
skipping.

At 100 TB the dominant cost of every batch query is the SCAN, and the
dominant scan lever after column pruning is LAYOUT: if the table's files and
row groups are clustered on the predicate column, the parquet reader prunes
them by their min/max statistics before decoding a byte of column data.
The reference engine (arroyo) never touches this — its Kafka payloads are
opaque bytes — but a 10^12-turn transcript table that serves conv_id
point-lookups and ts-range backfills lives or dies on it: an unclustered
table makes `WHERE conv_id = X` decode every row group in 100 TB; a
clustered one decodes O(rows matching / rows-per-group) groups.

Two pieces, both deliberately boring Spark:

- ``write_clustered``: ``repartitionByRange(cluster_cols)`` +
  ``sortWithinPartitions`` -> every output file covers a narrow,
  NON-OVERLAPPING range of the cluster key (global range clustering; the
  range exchange samples key quantiles so skew cannot stuff one file).
  This is the one full shuffle a layout rewrite costs — paid once,
  amortized over every subsequent scan. ``maxRecordsPerFile`` bounds file
  size so row groups stay prunable at fine grain.
- ``rowgroup_admit_stats``: a pyarrow-side audit that answers, for a
  predicate ``lo <= col <= hi``, how many row groups ADMIT the predicate
  by min/max stats (must be decoded) vs the total — the same decision
  Spark's vectorized parquet reader makes with
  ``spark.sql.parquet.filterPushdown``. It turns "trust me, it skips"
  into a measured number a test can assert on.

Scale notes (10^12 rows): the audit reads FOOTERS only (KBs per file),
never data pages, so it is runnable against the production table as a
layout-health probe; clustering by (conv_id) serves point/prefix lookups
while (ts) serves time-range backfills — pick the dominant predicate, or
write two projections the way warehouse engines maintain sort orders.
"""

from __future__ import annotations

import glob
import os
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int = 8,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as parquet range-clustered on ``cluster_cols``.

    ``repartitionByRange`` assigns each output file a contiguous,
    non-overlapping key range (sampled quantile boundaries — skew-aware),
    and the within-partition sort keeps every ROW GROUP inside a file
    narrow too, so min/max pruning works at both the file and row-group
    level. All JVM: one range exchange + one sort, no Python.
    """
    _write_ranged(df, path, cluster_cols, None, n_files, max_records_per_file, mode)


def _write_ranged(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    drop_col: str | None,
    n_files: int,
    max_records_per_file: int | None,
    mode: str,
) -> None:
    """Shared range-exchange + in-file sort + parquet write (the one
    writer construction both layout entry points use, so options stay in
    lockstep)."""
    out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    if drop_col is not None:
        out = out.drop(drop_col)
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def _quantile_bounds(df: DataFrame, c: str, n: int, seed: int = 7) -> tuple[Column, list]:
    """(comparable column expr, n-1 equal-population boundary literals).

    Numeric/timestamp columns use ``approxQuantile`` (one Greenwald-Khanna
    pass). Strings use a bounded uniform SAMPLE's order statistics — the
    same estimator repartitionByRange's RangePartitioner applies — because
    the bucketing MUST be lexicographic, not hashed: parquet min/max stats
    on the raw column only prune when bucket order == column order. (A
    hash bucket would balance perfectly and prune nothing.)
    """
    dt = dict(df.dtypes)[c]
    if dt == "string":
        cnt = df.count()
        target = max(n * 16, 2048)
        frac = min(1.0, target / max(cnt, 1))
        vals = sorted(r[0] for r in df.select(c).sample(frac, seed).collect() if r[0] is not None)
        if not vals:
            return F.col(c), []
        bounds = [vals[min(len(vals) - 1, (len(vals) * i) // n)] for i in range(1, n)]
        return F.col(c), bounds
    as_num = (
        F.col(c).cast("timestamp").cast("double")
        if dt.startswith("timestamp")
        else F.col(c).cast("double")
    )
    probs = [i / n for i in range(1, n)]
    bounds = df.select(as_num.alias("_x")).approxQuantile("_x", probs, 0.001)
    return as_num, bounds


def zorder_key(df: DataFrame, cols: Sequence[str], bits_per_col: int = 8) -> DataFrame:
    """Attach ``_zkey``: the bit-interleave (Morton code) of per-column
    quantile buckets. Sorting by ``_zkey`` gives every listed column
    locality in the SAME file layout — the multi-predicate generalization
    of single-column clustering (the Z-ORDER of Delta/Iceberg OPTIMIZE),
    here as plain column expressions: one bounded quantile/sample sketch
    per column at plan time, then a pure projection (a 2^bits-term JVM
    fold per column — the one-time write cost of the layout).

    The quantile sketches are driver actions over ``df`` (one per column,
    plus the write itself re-reads it): if ``df`` is a derived plan —
    not a bare scan — cache or ``localCheckpoint`` it first, or every
    sketch re-executes the upstream derivation.
    """
    ncols = len(cols)
    if bits_per_col * ncols > 63:  # ADVICE r5 #2: interleaved bits past the
        # long's sign bit would yield negative _zkey values that silently
        # scramble the sort order (locality lost, rows still correct)
        raise ValueError(
            f"zorder_key: bits_per_col({bits_per_col}) * len(cols)({ncols}) "
            "> 63 overflows the int64 Morton key; lower bits_per_col"
        )
    reserved = {"_zkey", *(f"_zb{j}" for j in range(ncols))}
    clash = reserved & set(df.columns)
    if clash:  # silent clobber-then-drop would vanish the caller's column
        raise ValueError(f"input already has reserved layout columns: {sorted(clash)}")
    out = df
    bnames = []
    for j, c in enumerate(cols):
        bn = f"_zb{j}"
        bnames.append(bn)
        expr, bounds = _quantile_bounds(df, c, 1 << bits_per_col)

        # bucket = #boundaries <= value. r6: BINARY-SEARCH when-tree over
        # the sorted boundary literals — log2(2^bits) comparisons per row
        # instead of the old aggregate() fold's 2^bits interpreted adds
        # (HOF lambdas never codegen). Identical value for sorted bounds,
        # duplicates included: "go right iff value >= bounds[mid]" lands
        # on exactly the count of boundaries <= value, and a NULL value
        # descends all-left to bucket 0 — the fold's NULL result too.
        # (A flat 2^bits when-CHAIN measured slower: stacked with the
        # Morton interleave it overflows codegen limits.)
        def bs(lo: int, hi: int) -> Column:
            if lo == hi:
                return F.lit(lo).cast("long")
            mid = (lo + hi) // 2
            return F.when(expr >= F.lit(bounds[mid]), bs(mid + 1, hi)).otherwise(
                bs(lo, mid)
            )

        out = out.withColumn(bn, bs(0, len(bounds)))
    # Morton interleave: bit i of bucket j lands at position i*ncols + j
    z = F.lit(0).cast("long")
    for j, bn in enumerate(bnames):
        for i in range(bits_per_col):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(bn), i).bitwiseAND(F.lit(1)), i * ncols + j
                )
            )
    return out.withColumn("_zkey", z).drop(*bnames)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits_per_col: int = 8,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order rewrite: range-cluster + sort on the Morton key, drop it.
    Every listed column's predicates then prune row groups from the ONE
    layout — the trade being each column gets ~sqrt of the pruning a
    dedicated single-column sort would give it (the classic Z-order
    bargain, worth it whenever two predicate shapes share a table)."""
    keyed = zorder_key(df, cols, bits_per_col)
    # staged: repartitionByRange first runs a SAMPLING job over its input
    # to pick range boundaries, then the real exchange — unstaged, the
    # Z-key projection executes twice (r6, guide §1.2)
    keyed = keyed.localCheckpoint(eager=False)
    _write_ranged(keyed, path, ["_zkey"], "_zkey", n_files, max_records_per_file, mode)


def rowgroup_admit_stats(path: str, col: str, lo, hi) -> dict:
    """Footer-only audit: how many row groups must be decoded for
    ``lo <= col <= hi``?

    A row group ADMITS the predicate when its [min, max] interval
    intersects [lo, hi] — exactly the test a stats-based parquet reader
    applies. Groups with no statistics for ``col`` conservatively admit
    (the reader must decode them), matching engine behavior.

    Returns totals over every ``*.parquet`` file under ``path``:
    ``{"files", "rowgroups", "admitting", "admit_frac", "rows",
    "admitted_rows"}``.
    """
    import datetime

    import pyarrow.parquet as pq

    def _norm(v):
        # TIMESTAMP_MICROS stats decode tz-aware (adjusted-to-UTC); the
        # session contract is UTC, so naive bounds mean UTC — align them.
        if isinstance(v, datetime.datetime) and v.tzinfo is None:
            return v.replace(tzinfo=datetime.timezone.utc)
        return v

    lo, hi = _norm(lo), _norm(hi)

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    n_groups = admitting = n_rows = admitted_rows = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        try:
            col_idx = meta.schema.names.index(col)
        except ValueError:
            raise ValueError(f"column {col!r} not in {f}: {meta.schema.names}")
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            n_groups += 1
            n_rows += rg.num_rows
            stats = rg.column(col_idx).statistics
            admit = True
            if stats is not None and stats.has_min_max:
                admit = not (_norm(stats.max) < lo or _norm(stats.min) > hi)
            if admit:
                admitting += 1
                admitted_rows += rg.num_rows
    return {
        "files": len(files),
        "rowgroups": n_groups,
        "admitting": admitting,
        "admit_frac": admitting / n_groups,
        "rows": n_rows,
        "admitted_rows": admitted_rows,
    }
