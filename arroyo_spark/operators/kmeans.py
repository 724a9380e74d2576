"""Deterministic distributed k-means + SemDeDup-style semantic dedup.

Training-data-pipeline additions (no reference counterpart — arroyo,
/root/reference/arroyo/processing/strategies/, has no relational or vector
surface). Two capabilities:

- ``train_kmeans``: Lloyd's iterations over embedding columns, built so the
  result is BIT-REPRODUCIBLE across runs, partitionings, and engines. The
  classic obstacle is the centroid update: a distributed mean sums doubles
  in partition order, and float addition is not associative — two runs (or
  Spark vs an oracle) disagree in the last ulp and every downstream
  assignment can flip. We make the update order-INDEPENDENT by fixed-point
  quantization: each coordinate contributes ``floor(x * 2^s + 0.5)`` as an
  int64, the per-(cell, pos) SUM is exact integer arithmetic (associative,
  commutative), and the new coordinate is ``qsum / (2^s * n)``. With s=20
  the quantization error per coordinate is <= 2^-21 — far below embedding
  noise — and the whole training run becomes a pure function of the input,
  checkable hash-exact against a DuckDB twin of the same algebra.
- ``semantic_dedup``: the SemDeDup shape (Abbas et al., arXiv:2303.09540):
  cluster the corpus with k-means, then search for near-duplicate pairs
  (cosine >= threshold) only WITHIN a cluster, keeping the lowest id.

Scale notes (10^9+ vectors, 100 TB):
- Assignment is a per-row projection against ONE broadcast row of centroid
  arrays (the ivf_ann_topk pattern — no N x K join, no shuffle between the
  scan and the aggregation).
- The update shuffles only (cell, pos) -> int64 partial sums: map-side
  combine reduces every partition to at most k*dim rows before the
  exchange, so the shuffle is O(k * dim * partitions), independent of N.
- Each iteration collects k*dim quantized sums to the driver (KBs) to
  rebuild the broadcast row — the same tiny driver round-trip every
  production k-means (including Spark MLlib's) performs per iteration.
- int64 headroom: |qsum| <= N_cell * max|x| * 2^s; at 10^9 rows, |x| <= 100,
  s=20 that is ~10^17 < 2^63.
- semantic_dedup's within-cell pair join is O(sum n_c^2); k is the knob
  that bounds cell size (SemDeDup runs k ~ sqrt(N)); cells shuffle as a
  hash-partitioned self-join on the cell id.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arroyo_spark.operators.similarity import _dot, _infer_dim, with_norm


@dataclass(frozen=True)
class Centroid:
    cell: int
    vec: list[float]
    norm: float


def _seq_norm(vec: list[float]) -> float:
    """Sequential left-to-right sum-of-squares fold — the SAME association
    as the JVM ``aggregate(zip_with(...))`` fold and DuckDB's
    ``list_dot_product``, so driver-computed centroid norms match both."""
    acc = 0.0
    for x in vec:
        acc += x * x
    return math.sqrt(acc)


def _prep(df: DataFrame, id_col: str, vec_col: str, dim: int | None) -> DataFrame:
    """Project to (_id, _vec double[], _norm), zero-norm rows excluded
    (the uniform degenerate-vector contract of the similarity family)."""
    return (
        with_norm(df, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .select(F.col(id_col).alias("_id"), "_vec", "_norm")
    )


def _cents_row(df: DataFrame, cents: list[Centroid]) -> DataFrame:
    """One broadcast row of centroid arrays (the ivf_ann_topk shape): a
    ~k*dim*8-byte BroadcastNestedLoopJoin against a single row — no shuffle,
    no per-row literal re-parse, no 200 KB janino expression."""
    return df.sparkSession.createDataFrame(
        [([c.cell for c in cents], [c.vec for c in cents], [c.norm for c in cents])],
        "_cells array<int>, _cvs array<array<double>>, _cns array<double>",
    )


# argmin over named_struct(negsim, cell): ascending struct order is exactly
# row_number() over (cosine DESC, cell ASC) — same near-tie discipline as
# ivf_ann_topk's probe pick, hash-proven there.
_ASSIGN_EXPR = (
    "element_at(array_sort(transform(sequence(0, size(_cells) - 1), i -> named_struct("
    "'negsim', -(aggregate(zip_with(_vec, element_at(_cvs, i + 1), (x, y) -> x * y), 0.0D,"
    " (a, x) -> a + x) / (_norm * element_at(_cns, i + 1))), "
    "'cell', element_at(_cells, i + 1)))), 1).cell"
)


def kmeans_assign(v: DataFrame, cents: list[Centroid]) -> DataFrame:
    """Attach ``cell`` = argmax-cosine centroid to a prepped (_id, _vec,
    _norm) frame. Pure projection: all k cells scored inside one transform
    over the broadcast centroid row."""
    return v.join(F.broadcast(_cents_row(v, cents))).select(
        "_id", "_vec", "_norm", F.expr(_ASSIGN_EXPR).alias("cell")
    )


def kmeans_update(assigned: DataFrame, scale_bits: int = 20) -> DataFrame:
    """The order-independent centroid update: (cell, pos, qsum, n) where
    qsum = SUM(floor(x * 2^s + 0.5)) over int64. Map-side combine collapses
    each partition to <= k*dim rows before the one exchange."""
    s = 1 << scale_bits
    return (
        assigned.select("cell", F.posexplode("_vec").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(
            F.sum(F.floor(F.col("val") * s + F.lit(0.5)).cast("long")).alias("qsum"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _next_cents(
    prev: list[Centroid], rows, scale_bits: int
) -> list[Centroid]:
    """Rebuild centroids from collected (cell, pos, qsum, n) rows. A cell
    with no members — or whose new centroid is all-zero — keeps its previous
    centroid (the deterministic empty-cell rule, mirrored in the oracle)."""
    s = 1 << scale_bits
    by_cell: dict[int, dict[int, tuple[int, int]]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], {})[r["pos"]] = (r["qsum"], r["n"])
    out: list[Centroid] = []
    for c in prev:
        got = by_cell.get(c.cell)
        if not got:
            out.append(c)
            continue
        vec = [got[p][0] / (s * got[p][1]) for p in sorted(got)]
        norm = _seq_norm(vec)
        out.append(Centroid(c.cell, vec, norm) if norm > 0 else c)
    return out


def train_kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    dim: int | None = None,
    scale_bits: int = 20,
) -> list[Centroid]:
    """Deterministic spherical-assignment Lloyd's: init = the k lowest-id
    vectors (cells numbered 0..k-1 in id order — a distributed TakeOrdered,
    no full sort), then ``n_iter`` rounds of assign -> quantized update.
    Returns driver-side centroids (k * dim doubles — KBs)."""
    dim = dim if dim is not None else _infer_dim(df, vec_col)
    v = _prep(df, id_col, vec_col, dim)
    init = v.orderBy("_id").limit(k).collect()
    cents = [
        Centroid(i, list(r["_vec"]), _seq_norm(r["_vec"])) for i, r in enumerate(init)
    ]
    for _ in range(n_iter):
        rows = kmeans_update(kmeans_assign(v, cents), scale_bits).collect()
        cents = _next_cents(cents, rows, scale_bits)
    return cents


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.95,
    dim: int | None = None,
    scale_bits: int = 20,
) -> DataFrame:
    """SemDeDup: k-means-cluster the embeddings, then flag every vector
    that has a LOWER-id neighbor in the SAME cell with cosine >= threshold
    (keep-lowest-id — the same survivor rule as the dedup family). Returns
    (id_col, cell, n_dups, is_dup) — a total decision for every non-zero
    vector. The pair search never leaves a cell: candidates shuffle as a
    hash self-join on the cell id, and k bounds the quadratic blow-up."""
    dim = dim if dim is not None else _infer_dim(df, vec_col)
    cents = train_kmeans(df, id_col, vec_col, k, n_iter, dim, scale_bits)
    a = kmeans_assign(_prep(df, id_col, vec_col, dim), cents)
    left = a.select(
        F.col("_id").alias("_lid"),
        F.col("cell").alias("_lc"),
        F.col("_vec").alias("_lv"),
        F.col("_norm").alias("_ln"),
    )
    right = a.select(
        F.col("_id").alias("_rid"),
        F.col("cell").alias("_rc"),
        F.col("_vec").alias("_rv"),
        F.col("_norm").alias("_rn"),
    )
    # the similarity predicate lives IN the left-join condition: a vector
    # with no qualifying lower-id neighbor must still surface (n_dups = 0),
    # which a join-then-filter would silently drop. Catalyst hash-joins on
    # the _lc = _rc equi part and applies the rest as the join residual.
    cond = (
        (F.col("_lc") == F.col("_rc"))
        & (F.col("_rid") < F.col("_lid"))
        & (
            _dot(F.col("_lv"), F.col("_rv"), None) / (F.col("_ln") * F.col("_rn"))
            >= F.lit(threshold)
        )
    )
    return (
        left.join(right, cond, "left")
        .groupBy("_lid", "_lc")
        .agg(F.count("_rid").alias("n_dups"))
        .select(
            F.col("_lid").alias(id_col),
            F.col("_lc").alias("cell"),
            F.col("n_dups").cast("long").alias("n_dups"),
            (F.col("n_dups") > 0).alias("is_dup"),
        )
    )
