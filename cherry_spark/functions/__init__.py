from cherry_spark.functions.crypto import (  # noqa: F401
    evm_signature_to_topic0,
    keccak256,
    svm_anchor_discriminator,
)
