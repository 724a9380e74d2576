"""Approximate-nearest-neighbor search over embedding columns.

First-class training-data-pipeline addition (no reference counterpart).
Two strategies:

- ``cosine_topk``: exact brute-force top-k. The dot product is a JVM-side
  ``aggregate(zip_with(...))`` over double arrays — bit-identical to
  DuckDB's list_dot_product, so results are oracle-checkable exactly.
  Quadratic: the correctness baseline and the small-N (<~10^5) path.
- ``lsh_ann_topk``: random-hyperplane LSH. Deterministic hyperplanes are
  derived from md5 of (plane, dim) — sign hashes bucket the vectors; the
  quadratic search runs only within buckets. This is the 10^9-vector
  path: bucket histogram ~ N/2^planes, each bucket's pair join is a
  hash-partitioned equi-join, and recall is tunable by planes/band count.

Scale notes: both avoid driver-side loops entirely; the brute-force join
broadcasts the smaller side automatically when a query set is provided.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arroyo_spark.operators.dedup import md5_hash64


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential left-to-right dot product (bit-identical to DuckDB's
    list_dot_product).

    With a static ``dim`` the sum is expanded to a flat 64-term expression
    — whole-stage-codegen'd, ~30x faster than the interpreted higher-order
    ``aggregate`` fold, with the SAME addition order (bit-exact parity).
    """
    # measured on 2M pairs x 64 dims: the HOF fold (18s) beats a statically
    # expanded 64-term sum (70s — the expression blows past codegen method
    # limits and falls back to interpreted element_at chains). ``dim`` is
    # kept for callers that want the expansion at small dims (<16).
    if dim is not None and dim < 16:
        out = F.element_at(a, 1) * F.element_at(b, 1)
        for i in range(2, dim + 1):
            out = out + F.element_at(a, i) * F.element_at(b, i)
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int | None:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row else None


def with_norm(df: DataFrame, vec_col: str = "embedding", dim: int | None = None) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn("_vec", v).withColumn("_norm", F.sqrt(_dot(v, v, dim)))


def cosine_topk(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (default: all).

    Output: (query_id, neighbor_id, cosine, rank) — ties broken by
    neighbor_id so results are total-ordered and reproducible.

    Zero-norm vectors are EXCLUDED from both sides (cosine is undefined;
    a 0/0 division would otherwise produce NaN/inf with engine-dependent
    ordering — Spark ranks NaN above all doubles, numpy's argsort places
    it last — so the contract is: degenerate vectors don't participate).
    Same filter in ``cosine_topk_blocked``, keeping the two bit-identical.
    """
    from pyspark.sql import Window as W

    # explicit dim skips the per-instantiation .first() driver job
    # (ADVICE r4 #4); inference stays as the fallback
    dim = dim if dim is not None else _infer_dim(df, vec_col)
    base = with_norm(df, vec_col, dim).filter(F.col("_norm") > 0).select(
        F.col(id_col).alias("neighbor_id"), F.col("_vec").alias("_bv"), F.col("_norm").alias("_bn")
    )
    qset = (
        with_norm(queries if queries is not None else df, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .select(
            F.col(id_col).alias("query_id"), F.col("_vec").alias("_qv"), F.col("_norm").alias("_qn")
        )
    )
    pairs = qset.join(base, F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine", _dot(F.col("_qv"), F.col("_bv"), dim) / (F.col("_qn") * F.col("_bn"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_blocked(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine for a BOUNDED query set — the fast verifier.

    The query set (contract: small — thousands, not the corpus; the
    all-pairs path at scale is LSH/IVF) is collected once and closed over
    by an Arrow-batched kernel that scores the full query x batch grid
    with numpy. Bit-identical to ``cosine_topk``/DuckDB: the dot product
    accumulates along the DIMENSION axis left-to-right (``acc += Q[:,d] *
    B[:,d]`` for d = 0..dim-1), which is exactly the sequential fold's
    0+p1+...+pn association — vectorized across pairs instead of one
    interpreted fold per pair (measured 21.5s -> ~2s on a 2M-pair grid).

    Scale shape: the base side streams through ``mapInPandas`` (no pair
    blowup materialized JVM-side; the grid lives one Arrow batch at a
    time), queries ride along as a ~MB closure — a broadcast in cluster
    terms. Output matches ``cosine_topk``: (query_id, neighbor_id,
    cosine, rank).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W

    # explicit dim skips the per-instantiation .first() driver job
    # (ADVICE r4 #4); inference stays as the fallback
    dim = dim if dim is not None else _infer_dim(df, vec_col)
    # zero-norm vectors excluded on BOTH sides — same contract and filter
    # as cosine_topk (cosine undefined; NaN ordering differs across
    # engines, which would break the bit-identical-verifier claim on
    # exactly the degenerate embeddings _cap_buckets warns about)
    # NOTE: the bound is checked post-collect (a .limit() would add a
    # single-partition funnel exchange, ~2x the whole collect step); the
    # check still turns contract misuse into a clear error before the
    # query matrix is built and broadcast into every task.
    qrows = (
        with_norm(queries, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .select(F.col(id_col).alias("_id"), "_vec", "_norm")
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"cosine_topk_blocked collects the query set to the driver: got "
            f"{len(qrows)} > max_queries={max_queries} rows — this is the "
            "bounded-query verifier; use lsh_ann_topk / ivf_ann_topk for "
            "corpus-vs-corpus"
        )
    Q = np.array([r["_vec"] for r in qrows], dtype=np.float64)  # (q, dim)
    qids = np.array([r["_id"] for r in qrows])
    qn = np.array([r["_norm"] for r in qrows], dtype=np.float64)
    nq = len(qrows)

    # spread the base side across the cluster BEFORE the kernel: a small
    # base (or a few large parquet files) would otherwise run the whole
    # grid in one Python worker while every other core idles
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, df.rdd.getNumPartitions())
    base = (
        with_norm(df, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .select(F.col(id_col).alias("neighbor_id"), "_vec", "_norm")
        .repartition(n_parts)
    )
    id_type = dict(base.dtypes)["neighbor_id"]

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # columns pre-sorted by neighbor_id so a STABLE argsort on
            # -cosine breaks ties by neighbor_id — the global ordering
            pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
            nid = pdf["neighbor_id"].to_numpy()
            B = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)  # (b, dim)
            bn = pdf["_norm"].to_numpy(dtype=np.float64)
            acc = np.zeros((nq, len(pdf)))
            for d in range(B.shape[1]):
                # outer-product accumulation: per pair this adds products
                # in index order starting from 0.0 — the HOF fold's exact
                # association (numpy has no FMA; plain IEEE mul-then-add)
                acc += Q[:, d, None] * B[None, :, d]
            cos = acc / (qn[:, None] * bn[None, :])
            # map-side top-k combine: emit only each query's k best from
            # THIS slice (self-pairs masked out) — the final window sees
            # parts*k rows per query instead of the whole pair grid
            key = np.where(qids[:, None] == nid[None, :], -np.inf, cos)
            kk = min(k, len(pdf))
            order = np.argsort(-key, axis=1, kind="stable")[:, :kk]  # (q, kk)
            rows_q = np.repeat(np.arange(nq), kk)
            cols = order.ravel()
            keep = key[rows_q, cols] != -np.inf
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, kk)[keep],
                    "neighbor_id": nid[cols][keep],
                    "cosine": cos[rows_q, cols][keep],
                }
            )

    scored = base.mapInPandas(
        score, f"query_id {id_type}, neighbor_id {id_type}, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_weight(seed: int, plane: int, dim_idx: int) -> float:
    """+1/-1 weight from md5(seed|plane|dim) — computed driver-side once per
    (plane, dim) and embedded as a literal; the identical arithmetic is
    reproducible in SQL (('0x'||substr(md5(...),1,15))::bigint % 2) * 2 - 1."""
    import hashlib

    h = int(hashlib.md5(f"{seed}|{plane}|{dim_idx}".encode()).hexdigest()[:15], 16)
    return float((h % 2) * 2 - 1)


def hyperplane_sign_bucket(
    vec_col: Column | str, n_planes: int = 8, dim: int | None = None, seed: int = 0
) -> Column:
    """Deterministic random-hyperplane bucket id for a vector column.

    The hyperplanes are CONSTANTS: their ±1 weights are md5-derived on the
    driver and baked into the expression as literals, so per row the
    bucket costs n_planes statically-expanded dot products (codegen'd) —
    no per-element hashing in the hot path. Returns an int in
    [0, 2^n_planes).

    Built as ONE SQL string through ``F.expr``: composing the ~n_planes*dim
    terms with Column operators costs one Py4J round-trip per node (~3.2s
    measured for 8x64 — pure driver overhead, tripled for multiband); the
    JVM SQL parser handles the same tree in milliseconds. The arithmetic is
    term-for-term identical to the old Column composition (sequential
    left-to-right adds), so results and oracle parity are unchanged.
    """
    if dim is None:
        raise ValueError("hyperplane_sign_bucket needs a static dim (use _infer_dim)")
    name = vec_col if isinstance(vec_col, str) else vec_col._jc.toString()
    v = f"cast(`{name}` as array<double>)"

    def plane_term(p: int) -> str:
        proj = " + ".join(
            f"(element_at({v}, {d + 1}) * {hyperplane_weight(seed, p, d):.1f}D)"
            for d in range(dim)
        )
        return f"(CASE WHEN ({proj}) > 0 THEN {1 << p} ELSE 0 END)"

    return F.expr(" + ".join(plane_term(p) for p in range(n_planes)))


def _cap_buckets(
    b: DataFrame, max_bucket_size: int | None, *bucket_cols: str
) -> DataFrame:
    """Drop rows in degenerate buckets (> max_bucket_size members).

    A sign-LSH bucket of B members costs O(B²) in the pair join — one
    pathological bucket (constant/zero embeddings, which scraped corpora
    contain in bulk) is a scale-killer at 10⁹ vectors. The cap makes worst-
    case per-bucket cost a constant: overflow buckets are excluded from the
    bucketed search and should be routed to a denser partitioner (more
    planes, or ``ivf_ann_topk`` whose per-cell cost is bounded by N/n_cells)
    — same contract as ``dedup.minhash_candidates(max_bucket_size=...)``.

    Plan shape matters here: finding degenerate buckets with a
    count-over-window would SHUFFLE every row by bucket — recreating the
    exact hot-partition skew the cap exists to avoid (the degenerate bucket
    IS the skewed key). Instead the overflow bucket ids are computed by a
    partial-aggregating groupBy (map-side combine, tiny result: one row per
    overfull bucket) and removed with a BROADCAST anti-join — no shuffle or
    sort of the data itself.
    """
    if max_bucket_size is None:
        return b
    overflow = (
        b.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket_size)
        .select(*bucket_cols)
    )
    return b.join(F.broadcast(overflow), list(bucket_cols), "left_anti")


def lsh_ann_topk(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 0,
    max_bucket_size: int | None = 10000,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking within LSH sign buckets.

    Vectors only compete inside their bucket — recall < 1 by design;
    increase recall with fewer planes (bigger buckets) or multiple seeds
    (band OR-ing, union + re-rank: ``lsh_ann_topk_multiband``). Buckets
    larger than ``max_bucket_size`` are dropped from the search entirely
    (degenerate-bucket guard, see ``_cap_buckets``).

    Plan shape: the (id, bucket) mapping is staged with localCheckpoint —
    the diamond below it (cap agg + both join sides) would otherwise
    recompute/re-codegen the n_planes*dim-term bucket expression three
    times (see ``embedding_dup_pairs``); candidate pairs shuffle as bare
    ids and vectors are joined back only for scoring.
    """
    from pyspark.sql import Window as W

    # explicit dim skips the per-instantiation .first() driver job
    # (ADVICE r4 #4); inference stays as the fallback
    dim = dim if dim is not None else _infer_dim(df, vec_col)
    # zero-norm vectors excluded (cosine undefined) — same contract as
    # cosine_topk; the inner joins on the filtered vector side drop them
    # from candidates even though the bucket mapping is built on raw df
    v = (
        with_norm(df, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .select(F.col(id_col).alias("_id"), "_vec", "_norm")
    )
    bk = df.select(
        F.col(id_col).alias("_id"),
        hyperplane_sign_bucket(F.col(vec_col), n_planes, dim=dim, seed=seed).alias("bucket"),
    ).localCheckpoint(eager=False)
    bk = _cap_buckets(bk, max_bucket_size, "bucket")
    a = bk.select("bucket", F.col("_id").alias("query_id"))
    c = bk.select("bucket", F.col("_id").alias("neighbor_id"))
    cand = a.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    va = v.select(F.col("_id").alias("query_id"), F.col("_vec").alias("_qv"), F.col("_norm").alias("_qn"))
    vb = v.select(F.col("_id").alias("neighbor_id"), F.col("_vec").alias("_bv"), F.col("_norm").alias("_bn"))
    scored = cand.join(va, "query_id").join(vb, "neighbor_id").withColumn(
        "cosine", _dot(F.col("_qv"), F.col("_bv"), dim) / (F.col("_qn") * F.col("_bn"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "cosine", "rank")
    )


def ivf_ann_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 2,
    dim: int | None = None,
    centroids: list | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse quantize into ``n_cells`` cells, search the
    query's ``n_probe`` closest cells only. Pass ``centroids`` (a
    ``train_kmeans`` result) to use a TRAINED coarse quantizer — the plan
    is identical, only the broadcast centroid row changes.

    The coarse quantizer is deterministic and training-free: the ``n_cells``
    LOWEST-id vectors act as (spherical) centroids — rank-based selection
    (orderBy(id).limit(n_cells) = a distributed TakeOrdered, no full sort),
    so sparse or offset id spaces still yield exactly n_cells centroids.
    The IVF structure (assign -> probe -> exact re-rank within cells) is
    what matters; a k-means fit would only move the centroids, not the
    plan. Costs:
    assignment is a per-row PROJECTION — the centroids are plan-time
    literals, so all K cell similarities are scored inside one
    ``transform`` over a constant-folded centroid array and the n_probe
    closest cells picked with ``array_sort`` + ``slice`` + ``posexplode``.
    Zero shuffle between the scan and the cell join (the previous
    join-then-``row_number`` form shuffled the full N x K grid — with
    vectors attached — through a window: ~10^11 rows at 10^9 vectors x
    128 cells, the classic scale-killer). The search join is
    hash-partitioned on cell id — each query competes against
    ~N/n_cells * n_probe candidates instead of N. Recall is tunable via
    n_probe. Scale path alternative to ``lsh_ann_topk``.
    """
    from pyspark.sql import Window as W

    # explicit dim skips the per-instantiation .first() driver job
    # (ADVICE r4 #4); inference stays as the fallback
    dim = dim if dim is not None else _infer_dim(df, vec_col)
    # spread the scan BEFORE the K-cell scoring projection: a small file
    # count would otherwise run the whole O(N*K*dim) assignment on one
    # core (same rationale as cosine_topk_blocked); at cluster scale the
    # scan has natural splits and this round-robin of N rows is noise
    n_parts = max(
        df.sparkSession.sparkContext.defaultParallelism, df.rdd.getNumPartitions()
    )
    v = (
        with_norm(df, vec_col, dim)
        # zero-norm exclusion (uniform contract with cosine_topk): a NaN
        # cosine would both rank above all doubles in the top-k window AND
        # sort opposite under the negsim struct array_sort probe pick,
        # silently changing probe assignment for degenerate vectors
        .filter(F.col("_norm") > 0)
        .select(F.col(id_col).alias("_id"), F.col("_vec"), F.col("_norm"))
        .repartition(n_parts)
    )
    # centroids are COLLECTED once at plan-build time (n_cells rows — KBs)
    # and attached to every row as ONE broadcast row of arrays (a ~64 KB
    # BroadcastNestedLoopJoin against a single row — no shuffle exchange,
    # no per-row recomputation; baking them in as a literal array worked
    # identically but cost ~25s of cold janino time on the 200 KB
    # expression). Every executor scores all K cells per row inside one
    # projection. Rank-based selection (lowest n_cells ids) keeps
    # sparse/offset id spaces yielding exactly n_cells centroids.
    if centroids is not None:
        # trained coarse quantizer (operators/kmeans.py::train_kmeans):
        # same plan, better cell balance/recall — the centroids are just a
        # different single broadcast row; cell ids are the kmeans cells
        cent_rows = [
            {"_id": int(c.cell), "_vec": list(c.vec), "_norm": float(c.norm)}
            for c in centroids
        ]
    else:
        cent_rows = v.orderBy("_id").limit(n_cells).collect()
    cents = df.sparkSession.createDataFrame(
        [(
            [r["_id"] for r in cent_rows],
            [r["_vec"] for r in cent_rows],
            [r["_norm"] for r in cent_rows],
        )],
        "_cells array<bigint>, _cvs array<array<double>>, _cns array<double>",
    )
    # sort key struct(negsim, cell): ascending struct order == sim DESC,
    # cell ASC — exactly a row_number() ordering on (sim DESC, cell). The
    # dot product is the same sequential zip_with/aggregate fold as _dot
    # (bit-identical to DuckDB's list_dot_product), so near-tie cell
    # choices match the oracle exactly.
    probe_expr = (
        "slice(array_sort(transform(sequence(0, size(_cells) - 1), i -> named_struct("
        "'negsim', -(aggregate(zip_with(_vec, element_at(_cvs, i + 1), (x, y) -> x * y), 0.0D,"
        " (a, x) -> a + x) / (_norm * element_at(_cns, i + 1))), "
        f"'cell', element_at(_cells, i + 1)))), 1, {n_probe})"
    )
    assign = (
        v.join(F.broadcast(cents))
        .select("_id", "_vec", "_norm", F.posexplode(F.expr(probe_expr)).alias("_pos", "_p"))
        .select(
            "_id",
            F.col("_p.cell").alias("cell"),
            (F.col("_pos") + 1).alias("_pr"),
            "_vec",
            "_norm",
        )
    )
    base = assign.filter(F.col("_pr") == 1).select(
        F.col("_id").alias("neighbor_id"), "cell", F.col("_vec").alias("_bv"), F.col("_norm").alias("_bn")
    )
    probes = assign.select(
        F.col("_id").alias("query_id"), "cell", F.col("_vec").alias("_qv"), F.col("_norm").alias("_qn")
    )
    pairs = probes.join(base, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine", _dot(F.col("_qv"), F.col("_bv"), dim) / (F.col("_qn") * F.col("_bn"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _pq_self_dots(cw_rows, m: int, sub: int) -> list[list[float]]:
    """Codeword self-dots dot(cw_jc, cw_jc), precomputed ONCE driver-side
    with the sequential left-to-right fold — bit-identical to ``_dot`` and
    to the SQL oracle's list_dot_product recomputation."""

    def seq_self_dot(xs) -> float:
        acc = 0.0
        for x in xs:
            acc = acc + x * x
        return acc

    return [
        [seq_self_dot(r["_vec"][j * sub : (j + 1) * sub]) for r in cw_rows]
        for j in range(m)
    ]


def _pq_exprs(m: int, sub: int, k_codes: int) -> tuple[str, str, str]:
    """The PQ SQL-expression trio shared by ``pq_ann_topk`` and
    ``ivfpq_ann_topk`` — ONE definition so the hash-exact oracle contract
    ("same fold, same bits") cannot drift between the two operators.

    Returns (codes_expr, qtab_expr, adc_ip):
    - codes_expr: per row, m argmins over k_codes codewords via the key
      dot(cw,cw) - 2*dot(x_j,cw) (ties -> smallest c), one projection
    - qtab_expr: the query's m*k_codes ADC lookup table (flattened)
    - adc_ip: sequential left-to-right sum over j of table lookups — the
      same association as the oracle's ts[1] + ... + ts[m]
    """

    def fold(a_expr: str, b_expr: str) -> str:
        return (
            f"aggregate(zip_with({a_expr}, {b_expr}, (x, y) -> x * y), 0.0D,"
            " (a, x) -> a + x)"
        )

    def cw(c_expr: str) -> str:  # codeword c's subspace-j slice
        return f"slice(element_at(_cvs, {c_expr}), j * {sub} + 1, {sub})"

    key = (
        "element_at(element_at(_ccs, j + 1), c + 1) - 2.0D * "
        f"{fold(f'slice(_vec, j * {sub} + 1, {sub})', cw('c + 1'))}"
    )
    codes_expr = (
        f"transform(sequence(0, {m - 1}), j -> element_at(slice(array_sort("
        f"transform(sequence(0, {k_codes - 1}), c -> named_struct('key', {key}, 'c', c))"
        f"), 1, 1), 1).c)"
    )
    qtab_expr = (
        f"flatten(transform(sequence(0, {m - 1}), j -> "
        f"transform(sequence(0, {k_codes - 1}), c -> "
        f"{fold(f'slice(_vec, j * {sub} + 1, {sub})', cw('c + 1'))})))"
    )
    adc_ip = " + ".join(
        f"element_at(_qtab, {j} * {k_codes} + element_at(_codes, {j} + 1) + 1)"
        for j in range(m)
    )
    return codes_expr, qtab_expr, adc_ip


def pq_ann_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    n_queries: int | None = 256,
    dim: int | None = None,
) -> DataFrame:
    """Product-quantization ANN: exhaustive scan in the COMPRESSED domain.

    The memory path for ANN at 10^9-10^12 vectors (complements
    ``lsh_ann_topk``/``ivf_ann_topk``, which bound the candidate SET): each
    base vector is stored as ``m`` one-byte codes + its true norm — a 32x
    compression at dim=64 float64 — and scored by ADC (asymmetric distance
    computation): each query precomputes its m x k_codes lookup table of
    subspace dot products once, and a pair then costs m table adds — per-
    pair work independent of dim, and shuffles and the index itself carry
    codes, never vectors. In a full deployment PQ composes with IVF (scan
    only the probed cells' codes); here the scan is exhaustive, which is
    exactly the in-RAM compressed sweep those systems run per cell.

    Deterministic training-free codebook, same rank-based selection as
    ``ivf_ann_topk``: the ``k_codes`` lowest-id vectors supply the
    codewords; subspace ``j``'s codeword ``c`` is that vector's ``j``-th
    ``dim/m``-slice. Encoding picks argmin_c ||x_j - cw_c||^2 via the key
    ``dot(cw, cw) - 2*dot(x_j, cw)`` (ties -> smallest c; the codeword
    self-dots are precomputed once driver-side with the same fold), and
    the ADC score is a sequential left-to-right sum of m per-subspace
    dots, each the same fold as ``_dot`` — so every arithmetic step is
    bit-reproducible in SQL (list_dot_product on slices + an ordered
    ts[1] + ... + ts[m] sum) and the oracle is hash-exact even though PQ
    itself is approximate.

    ``n_queries`` bounds the query side (lowest ids; None = all vectors) —
    the query set is broadcast so the compressed base scan never shuffles.
    Output: (query_id, neighbor_id, approx_cosine, rank) — approximate by
    design (reconstruction error), verified bit-exactly against the SQL
    oracle and by a recall test vs exact ``cosine_topk``.
    """
    from pyspark.sql import Window as W

    dim = dim if dim is not None else _infer_dim(df, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    n_parts = max(
        df.sparkSession.sparkContext.defaultParallelism, df.rdd.getNumPartitions()
    )
    v = (
        with_norm(df, vec_col, dim)
        .filter(F.col("_norm") > 0)  # uniform zero-norm contract
        .select(F.col(id_col).alias("_id"), "_vec", "_norm")
        .repartition(n_parts)
    )
    # codebook: k_codes rows — KBs — collected once and attached as ONE
    # broadcast row of arrays (same shape as ivf_ann_topk's centroids)
    cw_rows = v.orderBy("_id").limit(k_codes).collect()

    # cc = dot(cw_jc, cw_jc) depends only on (j, c): precomputed ONCE on
    # the driver (shared helper, same sequential fold) — halves the
    # per-row encode folds vs recomputing cc per (row, j, c)
    ccs = _pq_self_dots(cw_rows, m, sub)
    cents = df.sparkSession.createDataFrame(
        [([r["_vec"] for r in cw_rows], ccs)],
        "_cvs array<array<double>>, _ccs array<array<double>>",
    )
    # per row: m argmins over k_codes codewords, inside one projection
    codes_expr, qtab_expr, adc_ip = _pq_exprs(m, sub, k_codes)
    base = (
        v.join(F.broadcast(cents))
        .select("_id", "_norm", F.expr(codes_expr).alias("_codes"))
        # the index row — m small ints + a double per vector, nothing else
        .select(
            F.col("_id").alias("neighbor_id"),
            F.col("_norm").alias("_bn"),
            "_codes",
        )
    )
    # ADC: each query precomputes its m*k_codes lookup table (one
    # projection against the broadcast codebook); a pair then costs m
    # table adds instead of a dim-term dot — the per-pair work no longer
    # depends on dim at all
    q = v if n_queries is None else v.orderBy("_id").limit(n_queries)
    q = q.join(F.broadcast(cents)).select(
        F.col("_id").alias("query_id"),
        F.expr(qtab_expr).alias("_qtab"),
        F.col("_norm").alias("_qn"),
    )
    scored = (
        base.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("approx_cosine", F.expr(adc_ip) / (F.col("_qn") * F.col("_bn")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("approx_cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_cosine", "rank")
    )


def ivfpq_ann_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 2,
    m: int = 8,
    k_codes: int = 64,
    dim: int | None = None,
) -> DataFrame:
    """IVF+PQ: the production ANN shape (FAISS IVFPQ) — IVF bounds the
    candidate SET (each query scores only its ``n_probe`` closest cells'
    members), PQ bounds the candidate MEMORY (those members are scanned as
    ``m`` one-byte codes + a norm, ADC lookup-table scoring). Composes the
    two operators this module already ships: cell assignment is
    ``ivf_ann_topk``'s single-projection broadcast-centroid pick, encoding
    and scoring are ``pq_ann_topk``'s (one GLOBAL codebook — IVF-Flat +
    global PQ — not per-cell residual codebooks, which would break the
    training-free determinism both oracles rely on).

    Plan shape at 10^12 vectors: one broadcast row (centroids + codebook +
    code self-dots), one projection per base row (cell + codes), the
    search join hash-partitioned on cell id with codes-only rows, per pair
    m table adds. Every arithmetic step is the shared sequential fold, so
    the composition stays hash-exact against SQL.
    """
    from pyspark.sql import Window as W

    dim = dim if dim is not None else _infer_dim(df, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    n_parts = max(
        df.sparkSession.sparkContext.defaultParallelism, df.rdd.getNumPartitions()
    )
    v = (
        with_norm(df, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .select(F.col(id_col).alias("_id"), "_vec", "_norm")
        .repartition(n_parts)
    )
    head = v.orderBy("_id").limit(max(n_cells, k_codes)).collect()
    cent_rows, cw_rows = head[:n_cells], head[:k_codes]
    ccs = _pq_self_dots(cw_rows, m, sub)
    consts = df.sparkSession.createDataFrame(
        [(
            [r["_id"] for r in cent_rows],
            [r["_vec"] for r in cent_rows],
            [r["_norm"] for r in cent_rows],
            [r["_vec"] for r in cw_rows],
            ccs,
        )],
        "_cells array<bigint>, _cents array<array<double>>, _cns array<double>, "
        "_cvs array<array<double>>, _ccs array<array<double>>",
    )

    # same probe expression as ivf_ann_topk (bit-identical cell choice)
    probe_expr = (
        "slice(array_sort(transform(sequence(0, size(_cells) - 1), i -> named_struct("
        "'negsim', -(aggregate(zip_with(_vec, element_at(_cents, i + 1), (x, y) -> x * y), 0.0D,"
        " (a, x) -> a + x) / (_norm * element_at(_cns, i + 1))), "
        f"'cell', element_at(_cells, i + 1)))), 1, {n_probe})"
    )
    codes_expr, qtab_expr, adc_ip = _pq_exprs(m, sub, k_codes)
    assign = (
        v.join(F.broadcast(consts))
        .select(
            "_id",
            "_vec",
            "_norm",
            F.expr(codes_expr).alias("_codes"),
            F.expr(qtab_expr).alias("_qtab"),
            F.posexplode(F.expr(probe_expr)).alias("_pos", "_p"),
        )
        .select(
            "_id", "_codes", "_qtab", "_norm",
            F.col("_p.cell").alias("cell"),
            (F.col("_pos") + 1).alias("_pr"),
        )
    )
    base = assign.filter(F.col("_pr") == 1).select(
        F.col("_id").alias("neighbor_id"), "cell", "_codes", F.col("_norm").alias("_bn")
    )
    probes = assign.select(
        F.col("_id").alias("query_id"), "cell", "_qtab", F.col("_norm").alias("_qn")
    )
    scored = (
        probes.join(base, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("approx_cosine", F.expr(adc_ip) / (F.col("_qn") * F.col("_bn")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("approx_cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_cosine", "rank")
    )


def lsh_ann_topk_multiband(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_bands: int = 3,
    seed: int = 0,
    max_bucket_size: int | None = 10000,
    dim: int | None = None,
) -> DataFrame:
    """Multi-band sign-LSH ANN: OR over ``n_bands`` independent hyperplane
    sets, union the candidate pairs, exact cosine re-rank.

    Single-band recall at 8 planes is the scale path's weakest number
    (~0.5-0.6 at k=5 on uniform vectors); each extra band multiplies the
    miss probability — 3 bands lift recall to ~0.9 for ~3x the candidate
    work (still << brute force). Candidates are deduped on (query,
    neighbor) BEFORE scoring, so a pair colliding in several bands is
    scored once. Per-band buckets are capped like ``lsh_ann_topk``.

    Output: (query_id, neighbor_id, cosine, rank) — no bucket column (a
    pair may come from any band).
    """
    from pyspark.sql import Window as W

    from functools import reduce

    # explicit dim skips the per-instantiation .first() driver job
    # (ADVICE r4 #4); inference stays as the fallback
    dim = dim if dim is not None else _infer_dim(df, vec_col)
    # zero-norm exclusion — uniform degenerate-vector contract (cosine_topk)
    v = with_norm(df, vec_col, dim).filter(F.col("_norm") > 0)
    # one bucket stream per band: band b's hyperplanes use seed+b, so the
    # ±1 weight sets are independent md5 draws. A UNION of per-band
    # projections, NOT posexplode(array(...)): stacking all n_bands
    # statically-expanded bucket expressions (n_bands * n_planes * dim
    # terms) into one Generate blows janino's 64KB method limit and drops
    # the whole stage to interpreted eval — each union branch stays within
    # codegen limits (measured: single 8x64 expression codegens fine).
    buckets = reduce(
        DataFrame.unionAll,
        [
            v.select(
                F.col(id_col).alias("_id"),
                F.lit(b).alias("band"),
                hyperplane_sign_bucket(F.col(vec_col), n_planes, dim=dim, seed=seed + b).alias(
                    "bucket"
                ),
            )
            for b in range(n_bands)
        ],
    )
    # stage the (id, band, bucket) mapping — a few int columns, tiny next
    # to the corpus: the plan below is diamond-shaped (cap agg + both join
    # sides), and without staging each consumer would recompute and
    # re-codegen the n_bands * n_planes * dim-term bucket expressions.
    # localCheckpoint = compute once, read three times (on a cluster the
    # same staging is a temp-table write).
    buckets = buckets.localCheckpoint(eager=False)
    buckets = _cap_buckets(buckets, max_bucket_size, "band", "bucket")
    a = buckets.select("band", "bucket", F.col("_id").alias("query_id"))
    c = buckets.select("band", "bucket", F.col("_id").alias("neighbor_id"))
    cand = (
        a.join(c, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vq = v.select(F.col(id_col).alias("query_id"), F.col("_vec").alias("_qv"), F.col("_norm").alias("_qn"))
    vn = v.select(F.col(id_col).alias("neighbor_id"), F.col("_vec").alias("_bv"), F.col("_norm").alias("_bn"))
    scored = cand.join(vq, "query_id").join(vn, "neighbor_id").withColumn(
        "cosine", _dot(F.col("_qv"), F.col("_bv"), dim) / (F.col("_qn") * F.col("_bn"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 0,
    max_bucket_size: int | None = 10000,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (>= threshold) within LSH
    buckets. Buckets over ``max_bucket_size`` are dropped (degenerate-bucket
    guard, see ``_cap_buckets``) — route overflow to more planes or IVF.

    Plan shape (multiband's staging pattern): the (id, bucket) mapping is
    computed ONCE and localCheckpointed — two int-ish columns, tiny next
    to the corpus — because the plan is diamond-shaped (cap agg + both
    join sides) and each consumer would otherwise recompute AND re-codegen
    the n_planes*dim-term bucket expression; r3's un-staged form spent
    ~2x its runtime re-optimizing those duplicated subtrees (bench
    6.25s -> ~2s staged). Vectors are joined back only to score the
    bucket-pruned candidate pairs — candidates shuffle as bare id pairs,
    never with 64-double payloads."""
    # explicit dim skips the per-instantiation .first() driver job
    # (ADVICE r4 #4); inference stays as the fallback
    dim = dim if dim is not None else _infer_dim(df, vec_col)
    # zero-norm exclusion — uniform degenerate-vector contract (cosine_topk)
    v = (
        with_norm(df, vec_col, dim)
        .filter(F.col("_norm") > 0)
        .select(F.col(id_col).alias("_id"), "_vec", "_norm")
    )
    bk = df.select(
        F.col(id_col).alias("_id"),
        hyperplane_sign_bucket(F.col(vec_col), n_planes, dim=dim, seed=seed).alias("bucket"),
    ).localCheckpoint(eager=False)
    bk = _cap_buckets(bk, max_bucket_size, "bucket")
    a = bk.select("bucket", F.col("_id").alias("id_a"))
    c = bk.select("bucket", F.col("_id").alias("id_b"))
    cand = a.join(c, "bucket").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    va = v.select(F.col("_id").alias("id_a"), F.col("_vec").alias("_av"), F.col("_norm").alias("_an"))
    vb = v.select(F.col("_id").alias("id_b"), F.col("_vec").alias("_bv"), F.col("_norm").alias("_bn"))
    scored = cand.join(va, "id_a").join(vb, "id_b").withColumn(
        "cosine", _dot(F.col("_av"), F.col("_bv"), dim) / (F.col("_an") * F.col("_bn"))
    )
    return scored.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")
