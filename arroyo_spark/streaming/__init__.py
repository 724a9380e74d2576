from arroyo_spark.streaming.commit import (  # noqa: F401
    CommitPolicy,
    CommitPolicyState,
    IMMEDIATE,
    ONCE_PER_SECOND,
)
