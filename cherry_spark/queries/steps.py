"""Step-library queries: each runs through the real pipeline machinery
(process_steps over a Dict[str, DataFrame] batch) so the driver's
correctness gate exercises the operators end-to-end (SURVEY §2.6/§2.8).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.plans import (
    CastByTypeConfig,
    CastConfig,
    EvmDecodeEventsConfig,
    HexEncodeConfig,
    SetChainIdConfig,
    SqlStepConfig,
    Step,
    StepKind,
    TransformStepConfig,
    process_steps,
)
from cherry_spark.sources.tables import load_table

_DEC = "decimal(18,2)"


@query(
    "cast_by_name",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_quantity AS BIGINT) AS INTEGER) AS qty_int,
           TRY_CAST(mixed AS INTEGER) AS maybe_int
    FROM (
        SELECT *,
               CASE WHEN l_linenumber = 1 THEN 'x'
                    ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) END AS mixed
        FROM lineitem
    )
    """,
    doc="CAST step with per-column map + allow_cast_fail -> try_cast "
    "null-on-failure (reference steps/cast.py:9-28).",
)
def cast_by_name(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "mixed",
        F.when(F.col("l_linenumber") == 1, F.lit("x")).otherwise(
            F.col("l_quantity").cast("long").cast("string")
        ),
    )
    out = process_steps(
        {"lineitem": li},
        [
            Step(
                StepKind.CAST,
                CastConfig(
                    "lineitem",
                    {"l_quantity": "int", "mixed": "int"},
                    allow_cast_fail=True,
                ),
            )
        ],
    )
    return out["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty_int"),
        F.col("mixed").alias("maybe_int"),
    )


@query(
    "cast_by_type",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS l_quantity,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS l_extendedprice,
           CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS l_discount
    FROM lineitem
    """,
    doc="CAST_BY_TYPE: every double column across the batch -> "
    "decimal(18,2) (reference steps/cast_by_type.py:9-28; the "
    "decimal256->decimal128 downcast shape, erc20_custom.py:176-184). "
    "Driver-facing columns are cast back to DOUBLE on BOTH sides: raw "
    "DECIMAL output hash-mismatches across engines (round-1 red row) — "
    "the decimal quantization is still proven because the double value "
    "reflects the (18,2) rounding applied inside the step.",
)
def cast_by_type(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = process_steps(
        {"lineitem": li},
        [Step(StepKind.CAST_BY_TYPE, CastByTypeConfig("double", "decimal(18,2)"))],
    )
    return out["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        F.col("l_discount").cast("double").alias("l_discount"),
    )


@query(
    "hex_encode",
    oracle="""
    SELECT doc_id, concat('0x', sha256(text)) AS payload
    FROM documents
    """,
    doc="HEX_ENCODE step: every binary column -> 0x-prefixed lowercase "
    "hex, schema binary->string (reference steps/hex_encode.py:10-28). "
    "Binary input synthesized as sha256(text) so DuckDB can reproduce it.",
)
def hex_encode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.unhex(F.sha2("text", 256)).alias("payload")
    )
    out = process_steps(
        {"documents": docs}, [Step(StepKind.HEX_ENCODE, HexEncodeConfig(prefixed=True))]
    )
    return out["documents"]


@query(
    "set_constant_col",
    oracle="""
    SELECT c_custkey, c_mktsegment, 8453 AS chain_id FROM customer
    """,
    doc="SET_CHAIN_ID: drop-and-append constant chain_id on every table "
    "(reference steps/set_chain_id.py:7-23).",
)
def set_constant_col(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    n = load_table(spark, sf_dir, "nation")
    out = process_steps(
        {"customer": c, "nation": n}, [Step(StepKind.SET_CHAIN_ID, SetChainIdConfig(8453))]
    )
    return out["customer"]


@query(
    "sql_step",
    oracle=f"""
    SELECT e.user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS {_DEC})) AS DOUBLE) AS total_value
    FROM events e
    WHERE e.event_type IN ('purchase', 'click')
    GROUP BY e.user_id
    """,
    doc="SQL escape hatch: batch tables registered as views, user SQL "
    "runs over them — replaces the reference's DataFusion step "
    "(steps/datafusion_step.py:8-29).",
)
def sql_step(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = process_steps(
        {"events": ev},
        [
            Step(
                StepKind.SQL,
                SqlStepConfig(
                    """
                    SELECT user_id,
                           COUNT(*) AS n_events,
                           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
                    FROM events
                    WHERE event_type IN ('purchase', 'click')
                    GROUP BY user_id
                    """,
                    output_table="by_user",
                ),
            )
        ],
    )
    return out["by_user"]


@query(
    "udf_transform_step",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_extendedprice * (1 - l_discount) > 90000
    """,
    doc="TRANSFORM escape hatch: user callback Batch -> Batch in native "
    "PySpark — replaces the reference's Polars step "
    "(steps/polars_step.py:8-21).",
)
def udf_transform_step(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")

    def runner(batch, ctx):
        df = batch["lineitem"].withColumn(
            "revenue", F.col("l_extendedprice") * (1 - F.col("l_discount"))
        )
        return {"result": df.filter(F.col("revenue") > ctx)}

    out = process_steps(
        {"lineitem": li},
        [Step(StepKind.TRANSFORM, TransformStepConfig(runner, context=90000))],
    )
    return out["result"].select("l_orderkey", "l_linenumber", "revenue")


@query(
    "decode_fixedwidth",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           substr(sha256(CAST(l_orderkey AS VARCHAR)), 25, 40) AS from_hex,
           substr(sha256(CAST(l_partkey AS VARCHAR)), 25, 40) AS to_hex,
           CAST(l_quantity AS BIGINT) * 1000000 + l_linenumber AS amount
    FROM lineitem
    """,
    doc="EVM_DECODE_EVENTS fixed-width path: synthesize Transfer-shaped "
    "logs (32-byte topics + big-endian uint256 data word) from lineitem, "
    "decode through the real pipeline step, hex the addresses. The "
    "oracle recomputes the expected decode directly — a full "
    "encode->decode inversion check (reference steps/evm_decode_events.py).",
)
def decode_fixedwidth(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", parallelize=True)
    amount = (F.col("l_quantity").cast("long") * 1000000 + F.col("l_linenumber")).cast(
        "long"
    )
    logs = li.select(
        "l_orderkey",
        "l_linenumber",
        F.unhex(F.sha2(F.col("l_orderkey").cast("string"), 256)).alias("topic1"),
        F.unhex(F.sha2(F.col("l_partkey").cast("string"), 256)).alias("topic2"),
        F.lit(None).cast("binary").alias("topic3"),
        F.lit(None).cast("binary").alias("topic0"),
        F.unhex(F.lpad(F.hex(amount), 64, "0")).alias("data"),
    )
    out = process_steps(
        {"logs": logs},
        [
            Step(
                StepKind.EVM_DECODE_EVENTS,
                EvmDecodeEventsConfig(
                    "Transfer(address indexed from, address indexed to, uint256 amount)",
                    allow_decode_fail=True,
                ),
            )
        ],
    )
    return out["decoded_logs"].select(
        "l_orderkey",
        "l_linenumber",
        F.lower(F.hex("from")).alias("from_hex"),
        F.lower(F.hex("to")).alias("to_hex"),
        F.col("amount").cast("long").alias("amount"),
    )


_DYNAMIC_ABI_ORACLE = """
    SELECT l_orderkey, l_linenumber,
           array_to_string(list_transform(list_value(l_orderkey, l_partkey),
                                          x -> CAST(x AS BIGINT)), ',') AS ids,
           array_to_string(list_transform(
               list_value(CAST(l_quantity AS BIGINT) * 1000000
                            + l_linenumber, l_suppkey),
               x -> CAST(x AS BIGINT)), ',') AS vals,
           concat(l_returnflag, '-', l_linestatus, '-',
                  CAST(l_orderkey AS VARCHAR)) AS memo,
           CAST(l_quantity AS BIGINT) - 50 AS delta
    FROM lineitem
"""


@query(
    "decode_dynamic_abi",
    oracle=_DYNAMIC_ABI_ORACLE,
    doc="FULL-ABI decode path (ERC-1155 TransferBatch shape + dynamic "
    "string + signed int256): payloads are ABI-encoded with native "
    "expressions (head offsets, length words, padded tails, "
    "two's-complement negatives), decoded through the real "
    "EVM_DECODE_EVENTS step — dynamic arrays via native "
    "transform/sequence over offset words, no UDF "
    "(operators/decode_evm.py:_decode_at). Oracle recomputes the "
    "expectation directly: a complete encode->decode inversion check "
    "(reference delegates this surface to its Rust core, "
    "steps/evm_decode_events.py:19-26).",
)
def decode_dynamic_abi(spark, sf_dir):
    return _decode_dynamic_abi_impl(spark, sf_dir, engine="native")


def _decode_dynamic_abi_impl(spark, sf_dir, engine):
    li = load_table(spark, sf_dir, "lineitem", parallelize=True)

    def word_u(col):  # unsigned 32-byte word from a long column
        return F.lpad(F.lower(F.hex(col)), 64, "0")

    def word_i(col):  # signed: F.hex(long) is already two's-complement
        return F.when(
            col < 0, F.concat(F.lit("f" * 48), F.lower(F.hex(col)))
        ).otherwise(F.lpad(F.lower(F.hex(col)), 64, "0"))

    val0 = (F.col("l_quantity").cast("long") * 1000000 + F.col("l_linenumber")).cast(
        "long"
    )
    delta = (F.col("l_quantity").cast("long") - 50).cast("long")
    memo = F.concat_ws(
        "-", F.col("l_returnflag"), F.col("l_linestatus"), F.col("l_orderkey")
    )
    memo_raw = F.encode(memo, "utf-8")
    memo_len = F.length(memo_raw)
    memo_pad = F.rpad(memo_raw, ((memo_len + 31) / 32).cast("int") * 32, b"\x00")
    # data params: ids uint256[], vals uint256[], memo string, delta int256
    # head = 4 words; both arrays have 2 elements -> constant offsets
    data_hex = F.concat(
        word_u(F.lit(128)),  # offset ids
        word_u(F.lit(224)),  # offset vals
        word_u(F.lit(320)),  # offset memo
        word_i(delta),
        word_u(F.lit(2)),
        word_u(F.col("l_orderkey")),
        word_u(F.col("l_partkey")),
        word_u(F.lit(2)),
        word_u(val0),
        word_u(F.col("l_suppkey")),
        word_u(memo_len),
    )
    logs = li.select(
        "l_orderkey",
        "l_linenumber",
        F.lit(None).cast("binary").alias("topic0"),
        F.unhex(F.sha2(F.col("l_orderkey").cast("string"), 256)).alias("topic1"),
        F.lit(None).cast("binary").alias("topic2"),
        F.lit(None).cast("binary").alias("topic3"),
        F.concat(F.unhex(data_hex), memo_pad).alias("data"),
    )
    out = process_steps(
        {"logs": logs},
        [
            Step(
                StepKind.EVM_DECODE_EVENTS,
                EvmDecodeEventsConfig(
                    "Batch(address indexed operator, uint256[] ids, "
                    "uint256[] vals, string memo, int256 delta)",
                    allow_decode_fail=True,
                    engine=engine,
                ),
            )
        ],
    )
    return out["decoded_logs"].select(
        "l_orderkey",
        "l_linenumber",
        # array cast, NOT transform(x -> cast): an outer transform
        # collapses onto the decode expression and re-evaluates the
        # whole array construction per element. Driver-facing columns
        # must be SCALAR — the driver canonicalizes via pandas
        # sort_values, which throws on ndarray cells — so the arrays
        # are joined to csv strings (array-typed coverage stays in
        # tests/test_abi_full.py).
        F.concat_ws(",", F.col("ids").cast("array<string>")).alias("ids"),
        F.concat_ws(",", F.col("vals").cast("array<string>")).alias("vals"),
        F.col("memo"),
        F.col("delta").cast("long").alias("delta"),
    )


@query(
    "decode_dynamic_abi_arrow",
    oracle=_DYNAMIC_ABI_ORACLE,
    doc="Same FULL-ABI decode through the VECTORIZED ARROW engine "
    "(operators/decode_evm_arrow.py: pandas-UDF byte decode, "
    "EvmDecodeEventsConfig(engine='arrow')) against the same oracle — "
    "puts the second decode engine under the driver's differential "
    "gate, not just the in-repo engine-vs-engine tests "
    "(tests/test_decode_arrow.py).",
)
def decode_dynamic_abi_arrow(spark, sf_dir):
    return _decode_dynamic_abi_impl(spark, sf_dir, engine="arrow")


@query(
    "borsh_decode_fixed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) * 1000000 + l_linenumber AS amount,
           substr(sha256(CAST(l_suppkey AS VARCHAR)), 1, 64) AS supplier_hex
    FROM lineitem
    """,
    doc="SVM_DECODE_INSTRUCTIONS fixed path: synthesize Borsh payloads "
    "(8-byte discriminator + u64 little-endian amount + 32-byte pubkey) "
    "from lineitem, decode through the real step (byte-swap hex "
    "expressions), oracle recomputes expected values directly — an "
    "encode->decode inversion check (reference steps/svm_decode_instructions.py).",
)
def borsh_decode_fixed(spark, sf_dir):
    from cherry_spark.operators.decode_svm import InstructionSignature, ParamInput
    from cherry_spark.plans.config import SvmDecodeInstructionsConfig

    disc = bytes.fromhex("f8c69e91e17587c8")  # anchor discriminator for 'swap'
    # parallelize: the payload synthesis (sha256 + byte-swap hex per
    # row) otherwise runs on the fixture's single row-group — 1 core
    # of 32 (measured 6.2 -> 1.7 s warm at sf0.1; the decode-query
    # precedent from CLAUDE.md)
    li = load_table(spark, sf_dir, "lineitem", parallelize=True)
    amount = (F.col("l_quantity").cast("long") * 1000000 + F.col("l_linenumber")).cast(
        "long"
    )
    be_hex = F.lpad(F.lower(F.hex(amount)), 16, "0")
    # little-endian = byte-reversed big-endian
    le_hex = F.concat(*[F.substring(be_hex, 15 - 2 * i, 2) for i in range(8)])
    payload = F.unhex(
        F.concat(
            F.lit(disc.hex()), le_hex, F.sha2(F.col("l_suppkey").cast("string"), 256)
        )
    )
    instructions = li.select(
        "l_orderkey",
        "l_linenumber",
        payload.alias("data"),
        *[F.lit(None).cast("binary").alias(f"a{i}") for i in range(10)],
    )
    sig = InstructionSignature(
        discriminator=disc,
        params=[ParamInput("amount", "u64"), ParamInput("supplier", "pubkey")],
    )
    out = process_steps(
        {"instructions": instructions},
        [
            Step(
                StepKind.SVM_DECODE_INSTRUCTIONS,
                SvmDecodeInstructionsConfig(sig, allow_decode_fail=True),
            )
        ],
    )
    return out["decoded_instructions"].select(
        "l_orderkey",
        "l_linenumber",
        F.col("amount").cast("long").alias("amount"),
        F.lower(F.hex("supplier")).alias("supplier_hex"),
    )


@query(
    "glaciers_decode",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_orderkey % 2 = 0
                THEN 'Transfer(address indexed from, address indexed to, uint256 amount)'
                ELSE 'Approval(address indexed owner, address indexed spender, uint256 amount)'
           END AS event_signature,
           CAST(l_quantity AS BIGINT) AS amount
    FROM lineitem
    """,
    doc="GLACIERS_EVENTS bulk decode: one (address, topic0) broadcast "
    "join routes logs to signatures, one decode branch per distinct "
    "LAYOUT (not per signature — plan size independent of ABI-db size), "
    "generic event_keys/event_values output per the public Glaciers "
    "contract (reference config.py:137-142, unwired there; wired here). "
    "Oracle recomputes the synthesized expectation per signature.",
)
def glaciers_decode(spark, sf_dir):
    from cherry_spark.functions.crypto import evm_signature_to_topic0
    from cherry_spark.plans.config import GlaciersEventsConfig

    sig_a = "Transfer(address indexed from, address indexed to, uint256 amount)"
    sig_b = "Approval(address indexed owner, address indexed spender, uint256 amount)"
    t0_a, t0_b = evm_signature_to_topic0(sig_a), evm_signature_to_topic0(sig_b)
    addr_a, addr_b = b"\x11" * 20, b"\x22" * 20

    li = load_table(spark, sf_dir, "lineitem", parallelize=True)
    even = F.col("l_orderkey") % 2 == 0
    logs = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(even, F.lit(addr_a)).otherwise(F.lit(addr_b)).alias("address"),
        F.when(even, F.lit(t0_a)).otherwise(F.lit(t0_b)).alias("topic0"),
        F.unhex(F.sha2(F.col("l_orderkey").cast("string"), 256)).alias("topic1"),
        F.unhex(F.sha2(F.col("l_partkey").cast("string"), 256)).alias("topic2"),
        F.lit(None).cast("binary").alias("topic3"),
        F.unhex(F.lpad(F.hex(F.col("l_quantity").cast("long")), 64, "0")).alias("data"),
    )
    abi_db = spark.createDataFrame(
        [(addr_a, t0_a, sig_a), (addr_b, t0_b, sig_b)],
        "address binary, topic0 binary, event_signature string",
    )
    out = process_steps(
        {"logs": logs, "abi_db": abi_db},
        [Step(StepKind.GLACIERS_EVENTS, GlaciersEventsConfig())],
    )
    decoded = out["decoded_logs"]
    # Transfer and Approval share a layout; 'amount' is param 3 in both
    amount_col = F.element_at(F.col("event_values"), 3).cast("long")
    return decoded.select(
        "l_orderkey",
        "l_linenumber",
        "event_signature",
        amount_col.alias("amount"),
    )


@query(
    "base58_encode",
    oracle="""
    WITH RECURSIVE src AS (
        SELECT doc_id, CAST(doc_id AS BIGINT) * 2654435761 + 7 AS v
        FROM documents
    ), digits AS (
        SELECT doc_id, v, '' AS acc FROM src
        UNION ALL
        SELECT doc_id, v // 58,
               substr('123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz',
                      CAST(v % 58 AS INT) + 1, 1) || acc
        FROM digits WHERE v > 0
    )
    SELECT d.doc_id,
           repeat('1', 8 - CAST(ceil(log2(s.v + 1) / 8.0) AS INT)) || d.acc
               AS payload
    FROM digits d JOIN src s USING (doc_id)
    WHERE d.v = 0
    """,
    doc="BASE58_ENCODE step over an 8-byte big-endian payload "
    "(reference steps/base58_encode.py). DuckDB has no base58 builtin, "
    "so the oracle re-derives it from the spec: recursive-CTE divmod-58 "
    "digit extraction plus '1'-per-leading-zero-byte — a full "
    "independent reimplementation, which upgrades the round-1 rows-only "
    "check to a value-verified one. Vector unit tests still cover "
    "arbitrary-width payloads.",
)
def base58_encode(spark, sf_dir):
    v = (F.col("doc_id").cast("long") * F.lit(2654435761) + 7).cast("long")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.unhex(F.lpad(F.hex(v), 16, "0")).alias("payload")
    )
    from cherry_spark.plans import Base58EncodeConfig

    out = process_steps(
        {"documents": docs}, [Step(StepKind.BASE58_ENCODE, Base58EncodeConfig())]
    )
    return out["documents"]


@query(
    "u256_binary_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           concat('0x', lpad(lower(hex(CAST(l_quantity AS BIGINT) * 1000000000000
                                       + l_linenumber)), 64, '0')) AS amount_bin
    FROM lineitem
    """,
    doc="U256_TO_BINARY step (decimal -> 32-byte big-endian) then "
    "HEX_ENCODE; oracle reconstructs the padded hex directly "
    "(reference steps/u256_to_binary.py:11-31 + uint256 policy §1.3).",
)
def u256_binary_roundtrip(spark, sf_dir):
    from cherry_spark.plans import U256ToBinaryConfig

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity").cast("long") * F.lit(10**12) + F.col("l_linenumber"))
        .cast("decimal(38,0)")
        .alias("amount_bin"),
    )
    out = process_steps(
        {"t": li},
        [
            Step(StepKind.U256_TO_BINARY, U256ToBinaryConfig()),
            Step(StepKind.HEX_ENCODE, HexEncodeConfig(prefixed=True)),
        ],
    )
    return out["t"]


@query(
    "u256_sum",
    oracle="""
    WITH limbs AS (
        SELECT l_returnflag AS flag,
               CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) AS l3,
               CAST(0 AS HUGEINT) AS l2,
               CAST(l_orderkey AS HUGEINT) AS l1,
               CAST(l_linenumber AS HUGEINT) AS l0
        FROM lineitem
    ),
    s AS (
        SELECT flag, SUM(l3) AS s3, SUM(l2) AS s2, SUM(l1) AS s1,
               SUM(l0) AS s0
        FROM limbs GROUP BY flag
    ),
    c0 AS (SELECT *, s0 % 18446744073709551616 AS r0,
                     s0 // 18446744073709551616 AS k0 FROM s),
    c1 AS (SELECT *, (s1 + k0) % 18446744073709551616 AS r1,
                     (s1 + k0) // 18446744073709551616 AS k1 FROM c0),
    c2 AS (SELECT *, (s2 + k1) % 18446744073709551616 AS r2,
                     (s2 + k1) // 18446744073709551616 AS k2 FROM c1),
    c3 AS (SELECT *, (s3 + k2) % 18446744073709551616 AS r3,
                     (s3 + k2) // 18446744073709551616 AS k3 FROM c2)
    SELECT flag,
      '0x' || printf('%08x%08x', CAST(k3 // 4294967296 AS BIGINT),
                                 CAST(k3 % 4294967296 AS BIGINT))
           || printf('%08x%08x', CAST(r3 // 4294967296 AS BIGINT),
                                 CAST(r3 % 4294967296 AS BIGINT))
           || printf('%08x%08x', CAST(r2 // 4294967296 AS BIGINT),
                                 CAST(r2 % 4294967296 AS BIGINT))
           || printf('%08x%08x', CAST(r1 // 4294967296 AS BIGINT),
                                 CAST(r1 % 4294967296 AS BIGINT))
           || printf('%08x%08x', CAST(r0 // 4294967296 AS BIGINT),
                                 CAST(r0 % 4294967296 AS BIGINT))
       AS u256_sum_hex
    FROM c3
    """,
    doc="EXACT uint256 SUM past Spark's Decimal(38) ceiling: per-row "
    "64-bit limb decomposition, four exact decimal limb sums "
    "(map-side partial aggregation works normally), then one carry "
    "propagation per group (functions/binary.py:u256_sum_agg/"
    "u256_sum_hex). Synthetic amounts q*2^192 + orderkey*2^64 + "
    "linenumber make every group total 64 decimal digits — far past "
    "Decimal(38) — and the oracle recombines HUGEINT limb sums with "
    "the same carry arithmetic. Closes the one real data-model gap vs "
    "the reference's decimal256(76,0) "
    "(reference steps/u256_to_binary.py:27).",
)
def u256_sum_query(spark, sf_dir):
    from cherry_spark.functions.binary import u256_sum_agg, u256_sum_hex

    # parallelize: the per-row hex synthesis + limb-split map feeds the
    # grouped partial agg; measured ~1.7 -> ~1.0s warm at sf0.1 (the
    # exchange is tiny: 7 groups x limb partials)
    li = load_table(spark, sf_dir, "lineitem", parallelize=True)
    amount_bin = F.unhex(
        F.concat(
            F.lpad(F.hex(F.col("l_quantity").cast("long")), 16, "0"),
            F.lit("0" * 16),
            F.lpad(F.hex(F.col("l_orderkey")), 16, "0"),
            F.lpad(F.hex(F.col("l_linenumber")), 16, "0"),
        )
    )
    df = li.select(
        F.col("l_returnflag").alias("flag"), amount_bin.alias("amount")
    )
    g = df.groupBy("flag").agg(u256_sum_agg(F.col("amount")).alias("s"))
    return g.select(
        "flag", u256_sum_hex(F.col("s")).alias("u256_sum_hex")
    )


@query(
    "svm_decode_logs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_linenumber AS BIGINT) AS count_val,
           CAST(l_quantity AS BIGINT) * 1000 - 50000 AS delta,
           CAST(l_orderkey % 2 = 1 AS INTEGER) AS flag
    FROM lineitem
    """,
    doc="SVM_DECODE_LOGS: the log-message path reuses the Borsh "
    "instruction compiler with an EMPTY discriminator (reference "
    "steps/svm_decode_logs.py:28-33) — certified through the same "
    "encode->decode inversion as borsh_decode_fixed, exercising the "
    "zero-length-discriminator validity rule and the SIGNED i64 "
    "two's-complement lane (delta goes negative for l_quantity < 50).",
)
def svm_decode_logs_query(spark, sf_dir):
    from cherry_spark.operators.decode_svm import InstructionSignature, ParamInput
    from cherry_spark.plans.config import SvmDecodeInstructionsConfig

    li = load_table(spark, sf_dir, "lineitem", parallelize=True)
    count_be = F.lpad(F.lower(F.hex(F.col("l_linenumber").cast("long"))), 8, "0")
    count_le = F.concat(*[F.substring(count_be, 7 - 2 * i, 2) for i in range(4)])
    delta = (F.col("l_quantity").cast("long") * 1000 - 50000).cast("long")
    # hex() of a negative long is already the 16-char two's complement
    delta_be = F.lpad(F.lower(F.hex(delta)), 16, "0")
    delta_le = F.concat(*[F.substring(delta_be, 15 - 2 * i, 2) for i in range(8)])
    flag_hex = F.when(F.col("l_orderkey") % 2 == 1, F.lit("01")).otherwise(
        F.lit("00")
    )
    payload = F.unhex(F.concat(count_le, delta_le, flag_hex))
    logs = li.select("l_orderkey", "l_linenumber", payload.alias("data"))
    sig = InstructionSignature(
        discriminator=b"",
        params=[
            ParamInput("count_val", "u32"),
            ParamInput("delta", "i64"),
            ParamInput("flag", "bool"),
        ],
    )
    out = process_steps(
        {"logs": logs},
        [
            Step(
                StepKind.SVM_DECODE_LOGS,
                SvmDecodeInstructionsConfig(
                    sig,
                    input_table="logs",
                    output_table="decoded_logs",
                    allow_decode_fail=True,
                ),
            )
        ],
    )
    return out["decoded_logs"].select(
        "l_orderkey",
        "l_linenumber",
        F.col("count_val").cast("long").alias("count_val"),
        F.col("delta").cast("long").alias("delta"),
        F.col("flag").cast("int").alias("flag"),
    )


@query(
    "join_block_data_step",
    oracle="""
    SELECT l.l_orderkey AS block_number, l.l_linenumber,
           CAST(l.l_quantity AS BIGINT) AS qty,
           o.o_custkey AS block_proposer,
           strftime(o.o_orderdate, '%Y-%m-%d') AS block_date
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    doc="JOIN_BLOCK_DATA through the real step (operators/joins.py:18): "
    "enrich fact tables with their block header row — broadcast the "
    "blocks side (headers are tiny relative to facts), prefix "
    "non-key block columns block_*. Declared-but-unwired in the "
    "reference (config.py:39); wired here and driver-certified.",
)
def join_block_data_step(spark, sf_dir):
    from cherry_spark.plans.config import JoinBlockDataConfig

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    logs = li.select(
        F.col("l_orderkey").alias("block_number"),
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    blocks = o.select(
        F.col("o_orderkey").alias("number"),
        F.col("o_custkey").alias("proposer"),
        F.date_format(
            F.col("o_orderdate").cast("timestamp"), "yyyy-MM-dd"
        ).alias("date"),
    )
    out = process_steps(
        {"logs": logs, "blocks": blocks},
        [Step(StepKind.JOIN_BLOCK_DATA, JoinBlockDataConfig(tables=["logs"]))],
    )
    return out["logs"].select(
        "block_number",
        "l_linenumber",
        "qty",
        F.col("block_proposer").alias("block_proposer"),
        F.col("block_date").alias("block_date"),
    )


@query(
    "validate_block_report",
    oracle="""
    WITH blocks0 AS (
        SELECT o_orderkey AS number,
               sha256(CAST(o_orderkey AS VARCHAR)) AS hash,
               CASE WHEN o_orderkey % 97 = 3 THEN 'deadbeef'
                    ELSE sha256(CAST(o_orderkey - 1 AS VARCHAR)) END AS parent_hash
        FROM orders
    ),
    blocks AS (
        SELECT * FROM blocks0
        UNION ALL SELECT * FROM blocks0 WHERE number % 5000 = 0
    ),
    logs AS (
        SELECT CASE WHEN l_partkey % 211 = 0 THEN l_orderkey + 1000000
                    ELSE l_orderkey END AS block_number
        FROM lineitem
    )
    SELECT
      CAST((SELECT COUNT(*) FROM (
          SELECT number FROM blocks GROUP BY number HAVING COUNT(*) > 1
      )) AS BIGINT) AS dup_block_numbers,
      CAST((SELECT COUNT(*) FROM blocks c
            JOIN (SELECT number + 1 AS number, hash FROM blocks) p
            USING (number)
            WHERE c.parent_hash <> p.hash) AS BIGINT) AS broken_parent_chain,
      CAST((SELECT COUNT(*) FROM logs l
            WHERE NOT EXISTS (SELECT 1 FROM blocks b
                              WHERE b.number = l.block_number))
           AS BIGINT) AS orphan_logs
    """,
    doc="EVM_VALIDATE_BLOCK_DATA in report form "
    "(operators/validate.py:evm_validation_report): duplicate block "
    "numbers, parent-hash chain breaks (equi-join on number = prev+1, "
    "no global lag window), and orphaned child rows — with one "
    "violation of each kind PLANTED (a duplicated header, a wrong "
    "parent_hash every 97th block, every 211th-partkey log pointed at "
    "a missing block), so nonzero counts certify the checks actually "
    "fire. The raise-or-pass step wraps the same checks.",
)
def validate_block_report(spark, sf_dir):
    from cherry_spark.operators.validate import evm_validation_report
    from cherry_spark.plans.config import EvmValidateBlockDataConfig

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    blocks0 = o.select(
        F.col("o_orderkey").alias("number"),
        F.sha2(F.col("o_orderkey").cast("string"), 256).alias("hash"),
        F.when(F.col("o_orderkey") % 97 == 3, F.lit("deadbeef"))
        .otherwise(F.sha2((F.col("o_orderkey") - 1).cast("string"), 256))
        .alias("parent_hash"),
    )
    blocks = blocks0.union(blocks0.filter(F.col("number") % 5000 == 0))
    logs = li.select(
        F.when(
            F.col("l_partkey") % 211 == 0, F.col("l_orderkey") + 1000000
        )
        .otherwise(F.col("l_orderkey"))
        .alias("block_number")
    )
    return evm_validation_report(
        {"blocks": blocks, "logs": logs},
        EvmValidateBlockDataConfig(),
    )


# ---------------------------------------------------------------------------
# High-level datasets API (cherry_spark/datasets.py — the reference
# README's `datasets` promise, README.md:19). Fixture tables are
# synthesized deterministically from lineitem/orders, the builders run
# the REAL composition (query model -> decode -> join / union -> agg),
# and the oracles replay the whole dataset in SQL.
# ---------------------------------------------------------------------------

_TRANSFER_T0 = "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"


@query(
    "dataset_erc20_transfers",
    oracle=f"""
    WITH logs AS (
        SELECT l_orderkey, l_linenumber,
               l_orderkey % 1000 AS block_number,
               substr(sha256(CAST(l_orderkey AS VARCHAR)), 25, 40) AS from_hex,
               substr(sha256(CAST(l_partkey AS VARCHAR)), 25, 40) AS to_hex,
               CAST(l_quantity AS BIGINT) * 1000000 + l_linenumber AS amount
        FROM lineitem
    ),
    blk AS (
        SELECT range AS number, 1700000000 + range * 12 AS ts
        FROM range(1000)
    )
    SELECT l.l_orderkey, l.l_linenumber, l.block_number,
           l.from_hex, l.to_hex, l.amount,
           b.ts AS block_timestamp
    FROM logs l JOIN blk b ON b.number = l.block_number
    WHERE l.block_number BETWEEN 100 AND 899
    """,
    doc="datasets.erc20_transfers — the high-level dataset builder "
    "(README-parity API, cherry_spark/datasets.py): Transfer-topic0 "
    "query-model filter + block-range pushdown -> full-ABI decode -> "
    "broadcast block-timestamp join, one call. Oracle replays the "
    "whole composition in SQL over the same synthesized fixtures.",
)
def dataset_erc20_transfers(spark, sf_dir):
    from cherry_spark import datasets

    li = load_table(spark, sf_dir, "lineitem", parallelize=True)
    amount = (
        F.col("l_quantity").cast("long") * 1000000 + F.col("l_linenumber")
    ).cast("long")
    logs = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") % 1000).alias("block_number"),
        F.unhex(F.lit(_TRANSFER_T0)).alias("topic0"),
        F.unhex(F.sha2(F.col("l_orderkey").cast("string"), 256)).alias("topic1"),
        F.unhex(F.sha2(F.col("l_partkey").cast("string"), 256)).alias("topic2"),
        F.lit(None).cast("binary").alias("topic3"),
        F.unhex(F.lpad(F.hex(amount), 64, "0")).alias("data"),
    )
    blocks = spark.range(1000).select(
        F.col("id").alias("number"),
        (F.lit(1700000000) + F.col("id") * 12).alias("ts"),
    )
    out = datasets.erc20_transfers(
        {"logs": logs, "blocks": blocks}, 100, 899
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("block_number").cast("long").alias("block_number"),
        F.lower(F.hex("from")).alias("from_hex"),
        F.lower(F.hex("to")).alias("to_hex"),
        F.col("amount").cast("long").alias("amount"),
        F.col("block_ts").cast("long").alias("block_timestamp"),
    )


@query(
    "dataset_address_appearances",
    oracle="""
    WITH tx AS (
        SELECT o_orderkey % 500 AS block_number,
               substr(sha256(CAST(o_custkey AS VARCHAR)), 25, 40) AS from_hex,
               substr(sha256(CAST(o_orderkey % 50 AS VARCHAR)), 25, 40) AS to_hex
        FROM orders
    ),
    lg AS (
        SELECT l_orderkey % 500 AS block_number,
               substr(sha256(CAST(l_suppkey AS VARCHAR)), 25, 40) AS addr_hex
        FROM lineitem
    ),
    appearances AS (
        SELECT from_hex AS address_hex, block_number,
               'tx_from' AS relationship FROM tx
        UNION ALL
        SELECT to_hex, block_number, 'tx_to' FROM tx
        UNION ALL
        SELECT addr_hex, block_number, 'log_emitter' FROM lg
    )
    SELECT address_hex, relationship,
           CAST(COUNT(*) AS BIGINT) AS n_appearances,
           CAST(MIN(block_number) AS BIGINT) AS first_block,
           CAST(MAX(block_number) AS BIGINT) AS last_block
    FROM appearances
    WHERE block_number BETWEEN 50 AND 449
    GROUP BY 1, 2
    """,
    doc="datasets.address_appearances — every (address, relationship) "
    "appearance count in a block range, unioned across transactions "
    "from/to and log emitters (the public cryo dataset shape): "
    "per-source projections into one map-side-combinable groupBy, no "
    "joins or windows (cherry_spark/datasets.py).",
)
def dataset_address_appearances(spark, sf_dir):
    from cherry_spark import datasets

    orders = load_table(spark, sf_dir, "orders", parallelize=True)
    li = load_table(spark, sf_dir, "lineitem", parallelize=True)
    addr20 = lambda c: F.unhex(  # noqa: E731
        F.substring(F.sha2(c.cast("string"), 256), 25, 40)
    )
    tx = orders.select(
        (F.col("o_orderkey") % 500).alias("block_number"),
        addr20(F.col("o_custkey")).alias("from"),
        addr20(F.col("o_orderkey") % 50).alias("to"),
    )
    logs = li.select(
        (F.col("l_orderkey") % 500).alias("block_number"),
        addr20(F.col("l_suppkey")).alias("address"),
    )
    out = datasets.address_appearances(
        {"transactions": tx, "logs": logs}, 50, 449
    )
    return out.select(
        F.lower(F.hex("address")).alias("address_hex"),
        "relationship",
        "n_appearances",
        "first_block",
        "last_block",
    )


def _zorder_oracle() -> str:
    from cherry_spark.writers.zorder import z_value_sql

    z = z_value_sql(["o_custkey % 4096", "o_orderkey % 4096"], bits=12)
    return f"""
    SELECT o_orderkey,
           CAST(o_custkey % 4096 AS BIGINT) AS x,
           CAST(o_orderkey % 4096 AS BIGINT) AS y,
           CAST({z} AS BIGINT) AS z_key
    FROM orders
    """


@query(
    "zorder_curve_key",
    oracle=_zorder_oracle(),
    doc="Morton (Z-order) curve key (writers/zorder.py:z_value): the "
    "bit-interleave that drives the multi-dimensional file layout — "
    "range-partitioning a 100 TB write by this key gives every file a "
    "small bounding box in EVERY dimension, so box predicates prune "
    "files on all axes at once (test_zorder.py demonstrates 16/16 -> "
    "<=6 files for a non-sort-dimension filter). Flat unrolled "
    "shift/mask expression, whole-stage codegen, bit-exact DuckDB "
    "twin.",
)
def zorder_curve_key(spark, sf_dir):
    from cherry_spark.writers.zorder import z_value

    orders = load_table(spark, sf_dir, "orders", parallelize=True)
    x = (F.col("o_custkey") % 4096).cast("long")
    y = (F.col("o_orderkey") % 4096).cast("long")
    return orders.select(
        "o_orderkey",
        x.alias("x"),
        y.alias("y"),
        z_value([x, y], bits=12).cast("long").alias("z_key"),
    )
