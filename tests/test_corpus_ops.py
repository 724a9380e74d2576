"""Connected-components dedup clustering + corpus-curation operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arroyo_spark.operators.corpus import (
    hash_bucket,
    hash_sample,
    pack_sequences,
    stratified_sample,
)
from arroyo_spark.operators.dedup import connected_components, dedup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def _union_find(edges):
    """Reference clustering: textbook union-find over the edge list."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_connected_components_matches_union_find(spark):
    # two chained clusters (A~B, B~C but never A~C), one pair, no overlap
    edges = [(1, 2), (2, 3), (3, 9), (20, 21), (30, 31), (31, 32), (30, 32)]
    got = {
        r.id: r.cluster_id
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    want = _union_find(edges)
    assert got == want
    assert got[9] == 1 and got[21] == 20 and got[32] == 30


def test_connected_components_long_chain_pointer_jump(spark):
    # a 64-node path: neighbor-min alone needs ~63 rounds — the pointer
    # jump must cut this under the 50-round backstop
    edges = [(i, i + 1) for i in range(63)]
    got = {
        r.id: r.cluster_id
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert set(got.values()) == {0} and len(got) == 64


def test_dedup_clusters_keep_semantics(spark):
    corpus = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    out = dedup_clusters(corpus, _pairs(spark, [(1, 3), (3, 5)]), "doc_id")
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in out.collect()}
    assert rows[1] == (1, True) and rows[3] == (1, False) and rows[5] == (1, False)
    # singletons never enter the iteration but keep themselves
    for s in (0, 2, 4, 6, 7):
        assert rows[s] == (s, True)
    # exactly one survivor per cluster + singletons
    assert sum(1 for _, k in rows.values() if k) == 6


def test_pack_sequences_concat_semantics(spark):
    df = spark.createDataFrame(
        [(1, "s", 100), (2, "s", 150), (3, "s", 300), (4, "s", 10), (5, "t", 600)],
        "doc_id long, shard string, n_tokens int",
    )
    out = {
        r.doc_id: (r.pack_id, r.pack_pos)
        for r in pack_sequences(df, "shard", "doc_id", "n_tokens", budget=256).collect()
    }
    # exclusive cumsums in shard s: 0, 100, 250, 550
    assert out[1] == (0, 0)
    assert out[2] == (0, 100)
    assert out[3] == (0, 250)  # starts in pack 0, straddles into packs 1-2
    assert out[4] == (2, 38)  # 550 // 256 = 2, 550 % 256 = 38
    assert out[5] == (0, 0)  # shards pack independently


def test_hash_sample_is_deterministic_and_nests(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    s10 = {r.k for r in hash_sample(df, "k", 0.10, salt="s").collect()}
    s20 = {r.k for r in hash_sample(df, "k", 0.20, salt="s").collect()}
    again = {r.k for r in hash_sample(df, "k", 0.10, salt="s").collect()}
    assert s10 == again  # replay-stable (the exactly-once-sink property)
    assert s10 < s20  # samples nest: growing the rate never resamples
    assert 0.06 < len(s10) / 2000 < 0.14
    # a different salt draws an (almost surely) different sample
    other = {r.k for r in hash_sample(df, "k", 0.10, salt="t").collect()}
    assert other != s10


def test_stratified_sample_rates_and_bucket_agreement(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, "lang", "doc_id", rates={"zh": 1.0}, default_rate=0.2, salt="x"
    )
    got = out.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in got}
    assert by_lang["zh"] == 500  # rate 1.0 keeps every row
    assert 60 < by_lang.get("en", 0) < 140  # default 0.2 of 500
    # the surviving en rows are exactly those under the bucket threshold
    kept = {
        r.doc_id
        for r in out.filter(F.col("lang") == "en")
        .select("doc_id")
        .collect()
    }
    buckets = {
        r.doc_id: r.b
        for r in df.filter(F.col("lang") == "en")
        .select("doc_id", hash_bucket("doc_id", salt="x").alias("b"))
        .collect()
    }
    assert kept == {d for d, b in buckets.items() if b < 2000}


def test_ngram_decontaminate_flags_overlap(spark):
    from arroyo_spark.operators.corpus import ngram_decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a fence"),  # 4 shared shingles
            (2, "quick brown fox"),  # 1 shared shingle
            (3, "completely different words entirely"),  # 0
            (4, ""),  # no shingles at all
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in ngram_decontaminate(train, bench, "doc_id", "text", min_overlap=2).collect()
    }
    assert out[1][0] == 4 and out[1][1] is True
    assert out[2] == (1, False)
    assert out[3] == (0, False) and out[4] == (0, False)
    assert len(out) == 4  # every train row gets a decision


def test_ngram_decontaminate_frac_threshold(spark):
    from arroyo_spark.operators.corpus import ngram_decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # 6 shingles, 4 hits -> frac 0.667: above both floors
            (1, "the quick brown fox jumps over a fence"),
            # long doc sharing the same 4 shingles among 17 -> frac 0.235:
            # passes the absolute floor but NOT the 0.5 fraction criterion
            (2, "the quick brown fox jumps over a fence and then runs far away into the deep dark woods"),
            (3, "completely different words entirely"),  # 0 hits
            (4, ""),  # no shingles: n_hits 0, frac undefined -> clean
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in ngram_decontaminate(
            train, bench, "doc_id", "text", min_overlap=2, frac_threshold=0.5
        ).collect()
    }
    assert out[1] == (4, True)
    assert out[2][0] == 4 and out[2][1] is False  # frac gate rejects
    assert out[3] == (0, False) and out[4] == (0, False)
    assert len(out) == 4
    # with the fraction gate off, the long doc IS flagged — the knob is live
    base = {
        r.doc_id: r.contaminated
        for r in ngram_decontaminate(
            train, bench, "doc_id", "text", min_overlap=2
        ).collect()
    }
    assert base[2] is True


def test_deterministic_shuffle_is_exact_global_rank(spark):
    from arroyo_spark.operators.corpus import deterministic_shuffle
    from arroyo_spark.operators.dedup import md5_hash64

    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    out = deterministic_shuffle(df, "k", salt="s", n_shards=16)
    got = {r.k: r.shuffle_rank for r in out.collect()}
    # reference: single global sort by (hash, key)
    ref_rows = (
        df.select("k", md5_hash64(F.concat(F.lit("s"), F.col("k").cast("string"))).alias("h"))
        .orderBy("h", "k")
        .collect()
    )
    want = {r.k: i for i, r in enumerate(ref_rows)}
    assert got == want
    assert sorted(got.values()) == list(range(500))  # a true permutation
    # original columns survive
    assert set(out.columns) == {"k", "shuffle_rank"}


def test_domain_mix_sample_budget_and_nesting(spark):
    from arroyo_spark.operators.corpus import domain_mix_sample, hash_bucket

    rows = [(i, "big", 100) for i in range(200)]  # actual = 20000
    rows += [(1000 + i, "small", 100) for i in range(10)]  # actual = 1000
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = domain_mix_sample(
        df, "lang", "doc_id", "n_chars",
        targets={"big": 5000.0, "small": 5000.0}, salt="t",
    )
    got = {r.doc_id for r in out.collect()}
    # under-budget stratum kept WHOLE (threshold saturates at n_buckets)
    assert {1000 + i for i in range(10)} <= got
    # over-budget stratum filtered by the exact derived threshold:
    # floor(10000 * 5000 / 20000) = 2500 buckets of 10000
    buckets = {
        r.doc_id: r.b
        for r in df.select("doc_id", hash_bucket("doc_id", salt="t").alias("b")).collect()
    }
    expect_big = {i for i in range(200) if buckets[i] < 2500}
    assert got - {1000 + i for i in range(10)} == expect_big
    # a larger budget NESTS the smaller mix
    bigger = {
        r.doc_id
        for r in domain_mix_sample(
            df, "lang", "doc_id", "n_chars",
            targets={"big": 10000.0, "small": 5000.0}, salt="t",
        ).collect()
    }
    assert got <= bigger


def test_ngram_repetition_ratio(spark):
    from arroyo_spark.operators.corpus import ngram_repetition

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),     # 7 shingles, 3 distinct
            (2, "w x y z"),               # 2 shingles, 2 distinct
            (3, "one two"),               # < 3 tokens: excluded
            (4, ""),                      # empty: excluded
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_ngrams, r.repeat_ratio) for r in
           ngram_repetition(df, "doc_id", "text").collect()}
    assert got[1] == (7, 1 - 3 / 7)
    assert got[2] == (2, 0.0)
    assert set(got) == {1, 2}


def test_duplicate_span_stats_fractions(spark):
    from arroyo_spark.operators.corpus import duplicate_span_stats

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),   # spans: abcdef, bcdefg, cdefgh
            (2, "a b c d e f x y"),   # shares only abcdef with doc 1
            (3, "p q r s t u"),       # 1 span, unique
            (4, "one two three"),     # < 6 tokens: excluded
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_frac)
        for r in duplicate_span_stats(df, "doc_id", "text", span_n=6).collect()
    }
    assert got[1] == (3, 1, 1 / 3)
    assert got[2] == (3, 1, 1 / 3)
    assert got[3] == (1, 0, 0.0)
    assert set(got) == {1, 2, 3}
    # min_docs above the corpus max: nothing is a dup
    none = {
        r.doc_id: r.n_dup_spans
        for r in duplicate_span_stats(
            df, "doc_id", "text", span_n=6, min_docs=3
        ).collect()
    }
    assert set(none.values()) == {0}


def test_strip_duplicate_lines_rebuild_and_thresholds(spark):
    from arroyo_spark.operators.corpus import strip_duplicate_lines

    footer = "copyright footer"
    df = spark.createDataFrame(
        [
            (1, "unique alpha\n" + footer + "\nunique beta"),
            (2, "unique gamma\n\n" + footer),      # blank line preserved
            (3, footer + "\n" + footer),            # doc becomes empty
            (4, "x\nunique delta"),                 # 'x' too short to count
            (5, "x\nunique epsilon"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_removed)
        for r in strip_duplicate_lines(
            df, "doc_id", "text", min_docs=2, min_line_chars=2
        ).collect()
    }
    assert out[1] == ("unique alpha\nunique beta", 2, 1)
    assert out[2] == ("unique gamma\n", 2, 1)       # blank line survives
    assert out[3] == ("", 0, 2)                     # fully-boilerplate doc kept as ''
    # short lines are never counted even though 'x' appears in 2 docs
    assert out[4] == ("x\nunique delta", 2, 0)
    assert out[5] == ("x\nunique epsilon", 2, 0)
    assert len(out) == 5


def test_validate_transcripts_invariants(spark):
    from arroyo_spark.operators.corpus import validate_transcripts

    rows = [
        # c1: canonical wellformed conversation (tool after assistant,
        # then a parallel second tool turn)
        ("c1", 0, "user", "hi", 0),
        ("c1", 1, "assistant", "calling tool", 1),
        ("c1", 2, "tool", "result a", 2),
        ("c1", 3, "tool", "result b", 3),
        ("c1", 4, "assistant", "answer", 4),
        # c2: starts with assistant -> not wellformed
        ("c2", 0, "assistant", "unprompted", 0),
        ("c2", 1, "user", "ok", 1),
        # c3: orphan tool (tool directly after user) + empty turn
        ("c3", 0, "user", "q", 0),
        ("c3", 1, "tool", "orphan result", 1),
        ("c3", 2, "assistant", "   ", 2),
        # c4: starts with user but no assistant turn at all
        ("c4", 0, "user", "hello?", 0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts long"
    )
    got = {
        r.conv_id: r.asDict()
        for r in validate_transcripts(df, order=("ts", "turn_idx")).collect()
    }
    assert got["c1"]["wellformed"] is True
    assert got["c1"]["orphan_tools"] == 0 and got["c1"]["n_tool"] == 2
    assert got["c2"]["wellformed"] is False
    assert got["c2"]["starts_with_user"] is False
    assert got["c3"]["orphan_tools"] == 1
    assert got["c3"]["empty_turns"] == 1
    assert got["c3"]["wellformed"] is False
    assert got["c4"]["starts_with_user"] is True
    assert got["c4"]["wellformed"] is False  # no assistant turn


def test_transcript_dedup_order_sensitive(spark):
    from arroyo_spark.operators.corpus import transcript_dedup

    rows = [
        # c1 and c1r: identical conversations (a retry) -> collapse
        ("c1", 0, "user", "Hello there!", 0),
        ("c1", 1, "assistant", "hi", 1),
        ("c1r", 0, "user", "hello THERE", 0),  # normalization-equal text
        ("c1r", 1, "assistant", "hi", 1),
        # c2: same turn BAG as c1 but swapped order -> must NOT collapse
        ("c2", 0, "assistant", "hi", 0),
        ("c2", 1, "user", "hello there", 1),
        # c3: same texts as c1 but different role on turn 1 -> distinct
        ("c3", 0, "user", "hello there", 0),
        ("c3", 1, "user", "hi", 1),
        # c4: c1's turns plus one more -> distinct
        ("c4", 0, "user", "hello there", 0),
        ("c4", 1, "assistant", "hi", 1),
        ("c4", 2, "user", "bye", 2),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts long"
    )
    got = {r.keep_conv_id: r.asDict() for r in transcript_dedup(df).collect()}
    assert set(got) == {"c1", "c2", "c3", "c4"}
    assert got["c1"]["dup_count"] == 2 and got["c1"]["n_turns"] == 2
    assert got["c2"]["dup_count"] == 1
    assert got["c3"]["dup_count"] == 1
    assert got["c4"]["dup_count"] == 1 and got["c4"]["n_turns"] == 3
    # fingerprints are all distinct across the four keepers
    assert len({r["conv_fp"] for r in got.values()}) == 4


def test_turn_echo_stats_semantics_and_plan(spark):
    from arroyo_spark.operators.corpus import turn_echo_stats

    rows = [
        # c1: assistant parrots the user (cross-role echo), then moves on
        ("c1", 0, "user", "Run the tests", 0),
        ("c1", 1, "assistant", "run the tests!", 1),  # echo + cross
        ("c1", 2, "assistant", "done", 2),
        # c2: double-written turn (same role) -> echo but NOT cross
        ("c2", 0, "user", "hi", 0),
        ("c2", 1, "user", "hi", 1),
        ("c2", 2, "assistant", "hello", 2),
        # c3: no echoes
        ("c3", 0, "user", "a", 0),
        ("c3", 1, "assistant", "b", 1),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts long"
    )
    out = turn_echo_stats(df, order=("ts", "turn_idx"))
    got = {r.conv_id: r.asDict() for r in out.collect()}
    assert got["c1"]["n_echo"] == 1 and got["c1"]["n_echo_cross"] == 1
    assert got["c1"]["has_echo"] is True
    assert got["c2"]["n_echo"] == 1 and got["c2"]["n_echo_cross"] == 0
    assert got["c3"]["n_echo"] == 0 and got["c3"]["has_echo"] is False
    assert abs(got["c1"]["echo_frac"] - 1 / 3) < 1e-12
    # lag window + per-conv agg share one hash partitioning (count only
    # the AQE final plan: toString repeats the tree under "Initial Plan")
    plan = out._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("Exchange hashpartitioning") == 1


def test_role_transition_stats_semantics_and_plan(spark):
    from arroyo_spark.operators.corpus import role_transition_stats

    rows = [
        # c1: user -> assistant -> user -> assistant
        ("c1", 0, "user", 0),
        ("c1", 1, "assistant", 1),
        ("c1", 2, "user", 2),
        ("c1", 3, "assistant", 3),
        # c2: user -> user (double-send) -> assistant
        ("c2", 0, "user", 0),
        ("c2", 1, "user", 1),
        ("c2", 2, "assistant", 2),
        # c3: single turn -> contributes NO transition
        ("c3", 0, "system", 0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, ts long")
    out = role_transition_stats(df, order=("ts", "turn_idx"))
    got = {(r.from_role, r.to_role): r.asDict() for r in out.collect()}
    # transitions: c1 u->a, a->u, u->a; c2 u->u, u->a; c3 none
    assert got[("user", "assistant")]["n_trans"] == 3
    assert got[("assistant", "user")]["n_trans"] == 1
    assert got[("user", "user")]["n_trans"] == 1
    assert set(got) == {("user", "assistant"), ("assistant", "user"), ("user", "user")}
    # row-normalization: P(to | from=user) sums to 1; exact int ratios
    assert abs(got[("user", "assistant")]["frac"] - 3 / 4) < 1e-12
    assert abs(got[("user", "user")]["frac"] - 1 / 4) < 1e-12
    assert abs(got[("assistant", "user")]["frac"] - 1.0) < 1e-12
    # corpus pass = one hash exchange (lag window); the normalizing window
    # and groupBy run over the tiny <=|roles|^2 aggregate
    plan = out._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("Exchange hashpartitioning(conv_id") == 1


def test_tool_latency_stats_semantics(spark):
    from datetime import datetime

    from arroyo_spark.operators.corpus import tool_latency_stats

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(sec: float):
        return datetime(2024, 1, 1, 0, 0, 0).replace(
            second=int(sec), microsecond=int(round((sec % 1) * 1e6))
        )

    rows = [
        # c1: assistant calls search, tool answers 2.5s later
        ("c1", 0, "assistant", None, t0),
        ("c1", 1, "tool", "search", at(2.5)),
        # c1: another search call answered 0.5s later
        ("c1", 2, "assistant", None, at(10)),
        ("c1", 3, "tool", "search", at(10.5)),
        # c2: python call answered 4s later
        ("c2", 0, "user", None, t0),
        ("c2", 1, "tool", "python", at(4)),
        # c3: tool turn OPENS the conversation -> counted, not timed
        ("c3", 0, "tool", "python", t0),
        # c4: PARALLEL tool batch — both results timed from the shared
        # invoking turn (t=20), not from each other
        ("c4", 0, "assistant", None, at(20)),
        ("c4", 1, "tool", "bash", at(21)),
        ("c4", 2, "tool", "bash", at(23)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, ts timestamp"
    )
    got = {
        r.tool: r.asDict()
        for r in tool_latency_stats(df, order=("ts", "turn_idx")).collect()
    }
    assert got["search"]["n_calls"] == 2 and got["search"]["n_timed"] == 2
    assert abs(got["search"]["p50_ms"] - 1500.0) < 1e-9  # interp of 500, 2500
    assert abs(got["search"]["max_ms"] - 2500.0) < 1e-9
    assert abs(got["search"]["avg_ms"] - 1500.0) < 1e-9
    assert got["python"]["n_calls"] == 2 and got["python"]["n_timed"] == 1
    assert abs(got["python"]["p50_ms"] - 4000.0) < 1e-9
    assert abs(got["python"]["p95_ms"] - 4000.0) < 1e-9
    # parallel batch: latencies 1s and 3s (both from the invoking turn),
    # NOT 1s and 2s (tool-to-tool gap)
    assert got["bash"]["n_timed"] == 2
    assert abs(got["bash"]["max_ms"] - 3000.0) < 1e-9
    assert abs(got["bash"]["avg_ms"] - 2000.0) < 1e-9


def test_validate_transcripts_one_based_turn_idx(spark):
    from arroyo_spark.operators.corpus import validate_transcripts

    # 1-based ingest convention: first turn under the declared order must
    # still count as starts_with_user (regression: turn_idx==0 hard-code)
    rows = [
        ("c1", 1, "user", "hi", 0),
        ("c1", 2, "assistant", "hello", 1),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts long"
    )
    r = validate_transcripts(df, order=("ts", "turn_idx")).collect()[0]
    assert r.starts_with_user is True and r.wellformed is True


def test_feature_hash_tfidf_contract(spark):
    """Vectorizer contract: unit L2 norm per doc, identical docs get
    identical vectors with cosine exactly 1, and the output is
    bit-deterministic across partitionings (the exact-int accumulation
    claim — float sums would differ per run)."""
    from arroyo_spark.operators.corpus import feature_hash_tfidf

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "completely different text about spark engines and parquet"),
        (4, "spark engines shuffle data across executors"),
        (5, ""),  # no tokens -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = feature_hash_tfidf(df, dim=32).collect()

    by_doc: dict[int, dict[int, float]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
    assert set(by_doc) == {1, 2, 3, 4}  # doc 5 vanished (no tokens)
    for d, vec in by_doc.items():
        assert abs(sum(w * w for w in vec.values()) - 1.0) < 1e-12, d
    # exact duplicates -> identical sparse vectors, cosine 1
    assert by_doc[1] == by_doc[2]
    cos = sum(by_doc[1].get(b, 0.0) * by_doc[2].get(b, 0.0) for b in by_doc[1])
    assert abs(cos - 1.0) < 1e-12
    # related docs (3,4 share 'spark'/'engines') more similar than unrelated
    def cosine(a, b):
        return sum(a.get(k, 0.0) * b.get(k, 0.0) for k in set(a) | set(b))
    assert cosine(by_doc[3], by_doc[4]) > cosine(by_doc[1], by_doc[3])
    # bit-determinism across partitionings: exact row-set equality
    out2 = feature_hash_tfidf(df.repartition(7, "text"), dim=32).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_sparse_cosine_topk_matches_dense_brute_force(spark):
    """Inverted-index retrieval == dense brute force over the same
    vectors: the bucket-join formulation is an execution strategy, not an
    approximation."""
    from arroyo_spark.operators.corpus import (
        feature_hash_ints,
        feature_hash_tfidf,
        sparse_cosine_topk,
    )

    rows = [(i, f"shared stem tokens t{i % 3} t{i % 5} unique{i}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ints = feature_hash_ints(df, dim=32).localCheckpoint(eager=True)
    got = sparse_cosine_topk(ints, ints.filter(F.col("doc_id") < 4), k=3).collect()

    dense: dict[int, dict[int, float]] = {}
    for r in feature_hash_tfidf(df, dim=32).collect():
        dense.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]

    def cos(a, b):
        return sum(dense[a].get(k, 0.0) * dense[b].get(k, 0.0) for k in dense[a])

    for qid in range(4):
        # brute force: docs sharing >=1 bucket (others have dot 0 and are
        # unreachable through posting lists — and unrankable ties anyway)
        cands = sorted(
            ((cos(qid, n), n) for n in dense if n != qid
             and set(dense[qid]) & set(dense[n])),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        mine = sorted(
            [(r["cosine"], r["neighbor_id"]) for r in got if r["query_id"] == qid],
            key=lambda t: (-t[0], t[1]),
        )
        assert [n for _, n in mine] == [n for _, n in cands], qid
        for (ca, _), (cb, _) in zip(mine, cands):
            assert abs(ca - cb) < 1e-12


def test_bm25_topk_semantics(spark):
    """BM25 contract: more shared query terms beats fewer; equal term
    matches -> the SHORTER doc wins (length normalization); scores
    bit-deterministic across partitionings (integer-exact ranking)."""
    from arroyo_spark.operators.corpus import bm25_topk

    rows = [
        (0, "alpha beta gamma"),                      # the query
        (1, "alpha beta gamma delta"),                # 3 shared, short
        (2, "alpha beta gamma " + "pad " * 30),       # 3 shared, long
        (3, "alpha beta zeta eta"),                   # 2 shared
        (4, "alpha theta iota kappa"),                # 1 shared
        (5, "unrelated words entirely here"),         # 0 shared
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(df, df.filter(F.col("doc_id") == 0), k=5).collect()
    ranked = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert ranked[0] == 1   # all 3 terms, short: the unambiguous best
    assert 5 not in ranked  # no shared term -> unreachable via postings
    scores = {r["neighbor_id"]: r["score"] for r in got}
    # length normalization: same 3 matches, the padded doc scores lower —
    # so much lower that 2 clean matches in a short doc (3) legitimately
    # outrank 3 matches drowned in padding (2): BM25 working as designed
    assert scores[1] > scores[2]
    assert scores[3] > scores[4]  # 2 shared terms beat 1 at equal length
    got2 = bm25_topk(
        df.repartition(5, "text"), df.filter(F.col("doc_id") == 0), k=5
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))


def test_rrf_fuse_semantics(spark):
    """RRF contract: a pair surfaced by BOTH systems outranks pairs one
    system loved (rank 1 once: 1/61 < 1/63 + 1/64); exact expected
    values; ties break by neighbor_id."""
    from arroyo_spark.operators.corpus import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 3), (1, 12, 4), (1, 13, 1)],
        "query_id long, neighbor_id long, rank int",
    )
    got = {r["neighbor_id"]: (r["rrf"], r["fused_rank"])
           for r in rrf_fuse([a, b], k0=60, k=4).collect()}
    assert got[11][0] == 1 / 62 + 1 / 63   # both systems
    assert got[12][0] == 1 / 63 + 1 / 64
    assert got[10][0] == 1 / 61            # one system's #1
    assert got[13][0] == 1 / 61
    assert got[11][1] == 1 and got[12][1] == 2
    assert got[10][1] == 3 and got[13][1] == 4  # equal rrf -> id tiebreak


def test_feature_hash_overflow_guard_raises_loudly(spark):
    """A pathological doc (one rare token repeated ~50k times) pushes
    |w_int| past the int64-safety bound: the engine must raise with a
    clear message, not let Spark's non-ANSI sum wrap while the DuckDB
    oracle (HUGEINT) doesn't — a silent divergence."""
    from arroyo_spark.operators.corpus import feature_hash_tfidf

    df = spark.createDataFrame(
        [(1, "spamtoken " * 50_000), (2, "a normal document here")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="overflow the"):
        feature_hash_tfidf(df, dim=64).collect()
