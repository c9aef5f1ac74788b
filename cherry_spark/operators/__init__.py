"""Step executors: pure functions ``Batch -> Batch`` (lazy, no action).

Dispatch table consumed by plans/pipeline.process_steps — the Spark
analog of the reference's if/elif chain (src/cherry_etl/pipeline.py:38-75),
except every kind declared is actually wired.
"""

from cherry_spark.operators.scalar import (  # noqa: F401
    base58_encode,
    cast,
    cast_by_type,
    hex_encode_step,
    set_chain_id,
    u256_to_binary,
)
from cherry_spark.operators.joins import join_block_data, join_transaction_data  # noqa: F401
from cherry_spark.operators.escape import sql_step, transform_step  # noqa: F401
from cherry_spark.operators.validate import evm_validate_block_data  # noqa: F401
from cherry_spark.operators.decode_evm import evm_decode_events, glaciers_events  # noqa: F401
from cherry_spark.operators.decode_svm import svm_decode_instructions, svm_decode_logs  # noqa: F401
