from arroyo_spark.operators.map import (  # noqa: F401
    INVALID_REASON_COL,
    run_task,
    run_task_pandas,
    run_task_safe,
)
from arroyo_spark.operators.filter import filter_step  # noqa: F401
from arroyo_spark.operators.explode import unfold, unbatch  # noqa: F401
from arroyo_spark.operators.reduce import (  # noqa: F401
    reduce_window,
    sliding_window,
    session_reduce_batch,
    batch_step,
    count_reduce,
    fold_groups,
)
from arroyo_spark.operators.join import (  # noqa: F401
    asof_join,
    correlate_tool_calls,
    orphan_calls,
    salted_agg,
    stream_correlate,
)
from arroyo_spark.operators.buffer import stateful_buffer  # noqa: F401
from arroyo_spark.operators.kmeans import (  # noqa: F401
    kmeans_assign,
    kmeans_update,
    semantic_dedup,
    train_kmeans,
)
from arroyo_spark.operators.corpus import (  # noqa: F401
    deterministic_shuffle,
    domain_mix_sample,
    hash_bucket,
    hash_sample,
    ngram_decontaminate,
    ngram_repetition,
    pack_sequences,
    role_transition_stats,
    stratified_sample,
    tool_latency_stats,
    transcript_dedup,
    transcript_fingerprints,
    turn_echo_stats,
    validate_transcripts,
)
from arroyo_spark.operators.dedup import (  # noqa: F401
    connected_components,
    dedup_clusters,
)
from arroyo_spark.operators.cep import (  # noqa: F401
    match_absence,
    match_adjacent,
    match_runs,
    match_sequence,
)
