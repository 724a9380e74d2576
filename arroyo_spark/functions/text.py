"""Text-analysis column functions — all JVM-side (whole-stage codegen).

These are the engine's replacement for the reference's opaque per-message
``function`` parameters (RunTask et al., the entire compute surface of
/root/reference/arroyo/processing/strategies/run_task.py:14-113): instead of
arbitrary Python callables we expose a library of declarative column
expressions that Catalyst can optimize and that never leave the JVM.

Every function here is also expressible in ANSI SQL (DuckDB) for the
oracle gate — see __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_tokens(col: Column | str) -> Column:
    """Normalized tokenization -> array<string>: lowercase, split on runs
    of non-alphanumerics, drop empties.

    Implemented as ONE split instead of regexp_replace chains: Spark's
    regexp_replace costs ~0.5 ms/row on this build regardless of match
    count (measured), while split is ~15x cheaper for identical semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")


def normalize_text(col: Column | str) -> Column:
    """Lowercase, strip punctuation, collapse whitespace, trim.

    The RunTask 'transform payload' analog for the per-turn text-normalize
    stage. split-on-runs + join + trim: splitting on "[^a-z0-9]+" can only
    produce empty elements at the ends (runs collapse interior ones), so a
    trim replaces the per-element filter lambda — no regexp_replace, no
    interpreted higher-order function in the hot path.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.array_join(F.split(F.lower(c), "[^a-z0-9]+"), " "))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    return F.size(word_tokens(col)).cast("int")


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length, alpha ratio, word length.

    score = 0.4*len_score + 0.4*alpha_ratio + 0.2*avg_word_len_score
    (deliberately simple so the oracle can mirror it exactly in SQL).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    ntok = token_count(c).cast("double")
    awl = F.when(ntok > 0, alpha / ntok).otherwise(F.lit(0.0))
    awl_score = F.least(awl / F.lit(8.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_score + F.lit(0.4) * alpha_ratio + F.lit(0.2) * awl_score
    ).alias("quality")


def lang_id(col: Column | str) -> Column:
    """Tiny n-gram/stopword language heuristic: en/de/fr/unknown.

    Counts distinctive stopwords per language; ties broken by fixed order.
    Not a real lang-id model — the Spark-side plumbing (pure-expression
    scoring over tokens) is the deliverable; swap the wordlists for a real
    model via a pandas UDF when libraries are available.
    """
    toks = word_tokens(col)
    en = F.array(*[F.lit(w) for w in ("the", "and", "of", "to", "is", "in", "that", "it")])
    de = F.array(*[F.lit(w) for w in ("der", "die", "das", "und", "ist", "nicht", "ein", "zu")])
    fr = F.array(*[F.lit(w) for w in ("le", "la", "les", "et", "est", "un", "une", "que")])

    def hits(words: Column) -> Column:
        return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))

    n_en, n_de, n_fr = hits(en), hits(de), hits(fr)
    best = F.greatest(n_en, n_de, n_fr)
    return (
        F.when(best == 0, F.lit("unknown"))
        .when(n_en == best, F.lit("en"))
        .when(n_de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def fingerprint64(col: Column | str) -> Column:
    """Deterministic 60-bit document fingerprint from md5 (rolling-hash analog).

    md5 is available in both Spark and DuckDB, so the fingerprint is
    oracle-checkable; 15 hex chars keep it inside a signed int64.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
