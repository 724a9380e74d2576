from arroyo_spark.functions.text import (  # noqa: F401
    normalize_text,
    token_count,
    word_tokens,
    quality_score,
    lang_id,
    fingerprint64,
)
