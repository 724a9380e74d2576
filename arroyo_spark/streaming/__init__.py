from arroyo_spark.streaming.commit import (  # noqa: F401
    CommitPolicy,
    CommitPolicyState,
    IMMEDIATE,
    ONCE_PER_SECOND,
)
from arroyo_spark.streaming.ledger import OffsetsLedger  # noqa: F401
from arroyo_spark.streaming.dlq import (  # noqa: F401
    DlqLimit,
    DlqLimitExceeded,
    DlqLimitState,
    split_dlq,
)
from arroyo_spark.streaming.sink import ExactlyOnceSink  # noqa: F401
from arroyo_spark.streaming.processor import FileStreamSource, StreamProcessor  # noqa: F401
