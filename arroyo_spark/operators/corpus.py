"""Corpus-curation operators: deterministic sampling + sequence packing.

Not present in the reference (arroyo has no relational surface); these are
the engine's training-data-pipeline additions alongside dedup/similarity.
Both families are pure JVM column expressions + at most one shuffle, and
both are bit-reproducible across engines so the DuckDB oracle gate holds
hash-exact.

Scale notes (10^9+ docs):
- hash sampling: zero shuffles — a map-side filter on a 60-bit md5-derived
  bucket. Reproducible across runs/retries/engines (unlike rand()-based
  df.sample, which is seed-AND-partitioning dependent), so a replayed epoch
  samples the same rows — the property the exactly-once sink needs.
- stratified rates ship as one broadcast map (strata cardinality is tiny:
  languages, sources, quality bins).
- sequence packing: one shuffle (hash by shard) + one per-shard window
  pass. Shards bound window-state skew: a shard is a unit of packing
  locality (at 100 TB: pick n_shards >> cores so stragglers rebalance, and
  pack within e.g. (lang, shard) so no single window sees the corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from arroyo_spark.operators.dedup import md5_hash64


def hash_bucket(col: Column | str, n_buckets: int = 10_000, salt: str = "") -> Column:
    """Deterministic bucket in [0, n_buckets): md5 of (salt || key).

    md5 -> first 15 hex chars -> int64 -> mod, the same primitive the dedup
    family uses — evaluates bit-identically in Spark and DuckDB. Swap for
    xxhash64 on a real cluster (cheaper); the algebra is unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (md5_hash64(F.concat(F.lit(salt), c.cast("string"))) % n_buckets).cast("int")


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Keep a deterministic ~fraction of rows keyed by key_col.

    A row survives iff its hash bucket < fraction * n_buckets, so the
    sample is a stable function of the key: re-runs, retries, and other
    engines agree row-for-row, and two samples with the same salt nest
    (fraction 0.1 is a subset of fraction 0.2 — the standard trick for
    growing a held-out set without resampling).
    """
    thr = int(round(fraction * n_buckets))
    return df.filter(hash_bucket(key_col, n_buckets, salt) < thr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep rate[stratum] of each stratum.

    The up/down-sampling step of corpus mixing (e.g. keep 100% of low-
    resource languages, 5% of crawl boilerplate). Rates ship as a literal
    CASE expression (strata cardinality is small by construction), the
    filter is map-side only: no shuffle, no driver collect.
    """
    thr: Column = F.lit(int(round(default_rate * n_buckets)))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(round(rate * n_buckets)))
        ).otherwise(thr)
    return df.filter(hash_bucket(key_col, n_buckets, salt) < thr)


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Concat-packing: assign documents to fixed token-budget packs.

    LLM pretraining concatenates documents in a deterministic order and
    cuts the token stream every ``budget`` tokens; a document belongs to
    the pack where its FIRST token lands (it may straddle the boundary —
    that is the actual training-data semantics, and it is what makes the
    operator exactly expressible as a window cumsum instead of a stateful
    first-fit loop):

      pack_id   = floor(exclusive_cumsum(tokens) / budget)
      pack_pos  = exclusive_cumsum(tokens) % budget

    per (shard, order). One shuffle (hash by shard), one window pass; the
    window state is a single running sum. Adds pack_id / pack_pos / the
    materialized token count; callers group by (shard, pack_id) to emit
    training rows.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("_excl", excl)
        .withColumn("pack_id", (F.col("_excl") / budget).cast("long"))
        .withColumn("pack_pos", (F.col("_excl") % budget).cast("long"))
        .drop("_excl")
    )
