from cherry_spark.streaming.continuous import (  # noqa: F401
    read_resume_cursor,
    run_continuous,
    run_streaming_delta_dedup,
    run_streaming_growing_dedup,
    run_streaming_growing_semdedup,
    run_structured_stream,
)
from cherry_spark.streaming.replay import range_batches  # noqa: F401
