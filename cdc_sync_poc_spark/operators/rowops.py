"""§2.2 — projections / filters / predicates / row transforms.

Every operator here is a pure Column expression (whole-stage codegen,
zero Python in the row path) except r07, whose Debezium wire format
genuinely needs a pandas UDF (SURVEY.md §2.9: "the only candidate").
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_sync_poc_spark.cdc.envelope import CDC_CTE, cdc_view
from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table


@register(
    "r01_filter_pending",
    oracle=f"""
WITH {CDC_CTE}
SELECT cdc_seq, operation, pk,
       CASE WHEN cdc_seq % 4 = 0 THEN 'Y' ELSE 'N' END AS processed_yn
FROM cdc WHERE CASE WHEN cdc_seq % 4 = 0 THEN 'Y' ELSE 'N' END = 'N'
""",
)
def r01_filter_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROCESSED_YN='N' cursor predicate
    (poc/tobe-oracle/init/04_create_procedures.sql:84,151,186; flag index
    02_create_cdc_tables.sql:134-139). Here the flag is derived, so the
    filter folds into the same codegen stage as the projection; on a real
    landing table with a stored flag column the equality predicate is
    pushed to the parquet scan (PushedFilters) — the columnar analog of
    the reference's B-tree flag index (see bench_q1 for a pushed scan
    predicate)."""
    cdc = cdc_view(spark, sf_dir)
    flag = F.when(F.col("cdc_seq") % 4 == 0, "Y").otherwise("N")
    return (
        cdc.withColumn("processed_yn", flag)
        .filter(F.col("processed_yn") == "N")
        .select("cdc_seq", "operation", "pk", "processed_yn")
    )


@register(
    "r02_project_rename",
    oracle="""
SELECT c_custkey AS member_id, c_name AS member_name,
       c_mktsegment AS member_type_cd, c_acctbal AS balance
FROM customer
""",
)
def r02_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASIS->TOBE column mapping: rename + drop unmapped
    (staging INSERT select-list,
    poc/tobe-oracle/init/04_create_procedures.sql:159-172; design table
    docs/02-설계/01_동기화_설계.md:218-224). Column pruning means the
    dropped columns are never read off disk."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").alias("member_id"),
        F.col("c_name").alias("member_name"),
        F.col("c_mktsegment").alias("member_type_cd"),
        F.col("c_acctbal").alias("balance"),
    )


@register(
    "r03_case_flag",
    oracle="""
SELECT o_orderkey, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_active
FROM orders
""",
)
def r03_case_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE status-char -> 0/1 flag (CASE STATUS WHEN 'Y' THEN 1 ELSE 0,
    poc/tobe-oracle/init/04_create_procedures.sql:94,169,258)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_active"),
    )


@register(
    "r04_codemap_join",
    oracle="""
SELECT c_custkey, coalesce(m.n_name, CAST(c.c_nationkey AS VARCHAR)) AS category_cd
FROM customer c
LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20) m
  ON c.c_nationkey = m.n_nationkey
""",
)
def r04_codemap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-map lookup with pass-through fallback (FN_CONVERT_CODE:
    NO_DATA_FOUND -> return source value,
    poc/tobe-oracle/init/03_create_mapping_tables.sql:40-59).

    The reference runs one SELECT per row; here it is a single broadcast
    hash join against the mapping dim + coalesce — O(rows) point lookups
    become one shared hash table per executor. The dim is filtered
    (n_nationkey < 20) so the unmapped->fallback branch is exercised.
    """
    cust = load_table(spark, sf_dir, "customer")
    dim = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 20)
        .select("n_nationkey", "n_name")
    )
    return cust.join(
        F.broadcast(dim), cust.c_nationkey == dim.n_nationkey, "left"
    ).select(
        "c_custkey",
        F.coalesce(F.col("n_name"), F.col("c_nationkey").cast("string")).alias(
            "category_cd"
        ),
    )


@register(
    "r05_cast_date_ts",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_shipdate AS DATE) AS ship_date,
       CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_midnight
FROM lineitem
""",
)
def r05_cast_date_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE <-> TIMESTAMP casts (CAST(rec.REG_DATE AS TIMESTAMP),
    poc/tobe-oracle/init/04_create_procedures.sql:170-171,259; reverse
    poc/asis-oracle/init/04_create_procedures.sql:119-120)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("ship_midnight"),
    )


def decode_epoch(c: Column) -> Column:
    """Heuristic epoch decode, faithful to CdcSyncService.java:246-265:
    value > 1e14 -> micros (floor-divided to millis, as the reference's
    ``new Timestamp(value/1000)`` does); value < 1e5 -> epoch days;
    else millis. Lossy by design (a genuine integer 50000 reads as
    epoch-days) — reproduced exactly, thresholds and all."""
    return (
        F.when(
            c > 100_000_000_000_000,
            F.timestamp_millis(F.floor(c / F.lit(1000)).cast("long")),
        )
        .when(c < 100_000, F.timestamp_millis(c.cast("long") * 86_400_000))
        .otherwise(F.timestamp_millis(c.cast("long")))
    )


_DECODE_SQL = """CASE WHEN {c} > 100000000000000 THEN epoch_ms({c} // 1000)
     WHEN {c} < 100000 THEN epoch_ms({c} * 86400000)
     ELSE epoch_ms({c}) END"""


@register(
    "r06_epoch_decode",
    oracle=f"""
WITH {CDC_CTE},
raws AS (
  SELECT cdc_seq, epoch_us(ts) AS reg_date_raw, ts_ms AS updated_at_raw,
         cdc_seq % 20000 AS expire_time_raw, prop_k AS plain_value
  FROM cdc
)
SELECT cdc_seq,
       {_DECODE_SQL.format(c='reg_date_raw')} AS reg_date,
       {_DECODE_SQL.format(c='updated_at_raw')} AS updated_at,
       {_DECODE_SQL.format(c='expire_time_raw')} AS expire_time,
       plain_value
FROM raws
""",
)
def r06_epoch_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic epoch decode with the column-NAME guard: only columns
    whose name matches DATE/_AT/TIME/TIMESTAMP are decoded
    (CdcSyncService.java:154-166,246-265); `plain_value` passes through
    untouched, demonstrating the guard. Three raw columns cover all
    three magnitude branches."""
    import re

    cdc = cdc_view(spark, sf_dir)
    raws = cdc.select(
        "cdc_seq",
        F.expr("unix_micros(ts)").alias("reg_date_raw"),
        F.col("ts_ms").alias("updated_at_raw"),
        (F.col("cdc_seq") % 20000).alias("expire_time_raw"),
        F.col("prop_k").alias("plain_value"),
    )
    name_guard = re.compile(r"(DATE|_AT|TIME|TIMESTAMP)", re.IGNORECASE)
    cols = []
    for c in raws.columns:
        base = c[: -len("_raw")] if c.endswith("_raw") else c
        if c.endswith("_raw") and name_guard.search(base):
            cols.append(decode_epoch(F.col(c)).alias(base))
        elif c != "cdc_seq" and not c.endswith("_raw"):
            cols.append(F.col(c))
    return raws.select("cdc_seq", *cols)


_WIRE_SCHEMA = T.StructType(
    [T.StructField("scale", T.IntegerType()), T.StructField("value", T.StringType())]
)


@F.pandas_udf(T.StringType())
def _encode_debezium_number(cents: pd.Series) -> pd.Series:
    """Simulate the Debezium wire encoding {scale:2, value:base64(BigInteger)}
    (sample at docs/04-운영/02_테스트_시나리오.md:242-247)."""
    def enc(v: int) -> str:
        n = int(v)
        length = max(1, (n.bit_length() + 8) // 8)
        return base64.b64encode(n.to_bytes(length, "big", signed=True)).decode()

    return cents.map(enc)


@F.pandas_udf(T.DoubleType())
def _decode_debezium_number(scale: pd.Series, b64: pd.Series) -> pd.Series:
    """Arrow-batched decode of Debezium NUMBER wire form
    (decodeDebeziumNumber, CdcSyncService.java:277-297): base64 ->
    two's-complement BigInteger -> unscaled / 10^scale."""
    unscaled = b64.map(
        lambda s: int.from_bytes(base64.b64decode(s), "big", signed=True)
    )
    return (unscaled / (10.0 ** scale)).astype("float64")


@register(
    "r07_decimal_decode",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE) / 100 AS price_decoded
FROM lineitem
""",
)
def r07_decimal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium NUMBER decode round-trip: price -> wire {scale, base64}
    -> decoded numeric. The only operator that justifies Python kernels
    (vectorized pandas UDFs over Arrow batches, never row-at-a-time).
    Entirely avoidable in production via decimal.handling.mode=string
    (register-connectors.sh:103) — implemented anyway for wire parity."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    wire = li.select(
        "l_orderkey",
        "l_linenumber",
        F.lit(2).alias("scale"),
        _encode_debezium_number(cents).alias("value_b64"),
    )
    return wire.select(
        "l_orderkey",
        "l_linenumber",
        _decode_debezium_number(F.col("scale"), F.col("value_b64")).alias(
            "price_decoded"
        ),
    )


@register(
    "r08_default_coalesce",
    oracle="""
SELECT o_orderkey,
       coalesce(nullif(o_orderpriority, '1-URGENT'), 'SYNC-DEFAULT') AS priority,
       'SYNC' AS created_by
FROM orders
""",
)
def r08_default_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NVL / default injection (NVL(CAST(REG_DATE...), SYSTIMESTAMP) and
    CREATED_BY='SYNC' constants,
    poc/tobe-oracle/init/04_create_procedures.sql:95-96,170,259)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
            F.lit("SYNC-DEFAULT"),
        ).alias("priority"),
        F.lit("SYNC").alias("created_by"),
    )


@register(
    "r09_sha256_hash",
    oracle=f"WITH {CDC_CTE} SELECT cdc_seq, pk, change_hash FROM cdc",
)
def r09_sha256_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical row hash: sha256 over 'table|pk|operation|payload'
    (FN_GENERATE_HASH, poc/tobe-oracle/init/04_create_procedures.sql:13-28;
    Java divergence generateHash, CdcSyncService.java:309-326 — this
    engine defines the single canonical form, functions/hashing.py)."""
    return cdc_view(spark, sf_dir).select("cdc_seq", "pk", "change_hash")


@register(
    "r10_op_decode",
    oracle=f"""
WITH {CDC_CTE}
SELECT cdc_seq, op,
       CASE op WHEN 'c' THEN 'INSERT' WHEN 'u' THEN 'UPDATE'
               WHEN 'd' THEN 'DELETE' WHEN 'r' THEN 'INSERT'
               ELSE 'UNKNOWN' END AS operation
FROM cdc
""",
)
def r10_op_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op-code decode c/u/d/r -> INSERT/UPDATE/DELETE/INSERT else UNKNOWN
    (convertOperation, CdcEvent.java:175-185)."""
    cdc = cdc_view(spark, sf_dir)
    op = F.col("op")
    return cdc.select(
        "cdc_seq",
        "op",
        F.when(op == "c", "INSERT")
        .when(op == "u", "UPDATE")
        .when(op == "d", "DELETE")
        .when(op == "r", "INSERT")
        .otherwise("UNKNOWN")
        .alias("operation"),
    )


@register(
    "r11_pick_before_after",
    oracle=f"""
WITH {CDC_CTE}
SELECT cdc_seq, op,
       val - 1.0 AS before_val, val AS after_val,
       CASE WHEN op = 'd' THEN val - 1.0 ELSE val END AS picked_val
FROM cdc
""",
)
def r11_pick_before_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload selection: DELETE reads `before`, everything else `after`
    (CdcEvent.getData(), CdcEvent.java:132-137)."""
    cdc = cdc_view(spark, sf_dir)
    before = F.col("val") - 1.0
    return cdc.select(
        "cdc_seq",
        "op",
        before.alias("before_val"),
        F.col("val").alias("after_val"),
        F.when(F.col("op") == "d", before).otherwise(F.col("val")).alias("picked_val"),
    )


@register(
    "r12_string_funcs",
    oracle="""
SELECT doc_id, upper(lang) AS lang_uc, substr(text, 1, 16) AS prefix16,
       (text LIKE '%data%') AS has_data, concat_ws('|', lang, source) AS tag
FROM documents
""",
)
def r12_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: UPPER (CdcSyncService.java:156,164),
    SUBSTR truncate (04_create_procedures.sql:102,178), LIKE filter
    (SimulatorController.java:210,271), concat (same file:207,214)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.substring("text", 1, 16).alias("prefix16"),
        F.col("text").like("%data%").alias("has_data"),
        F.concat_ws("|", "lang", "source").alias("tag"),
    )


@register(
    "r13_ts_convert",
    oracle=f"""
WITH {CDC_CTE}
SELECT cdc_seq,
       coalesce(epoch_ms(CASE WHEN cdc_seq % 10 = 0 THEN NULL ELSE ts_ms END),
                TIMESTAMP '2024-02-01 00:00:00') AS converted
FROM cdc
""",
)
def r13_ts_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-millis -> datetime with null -> default
    (convertTimestamp, CdcEvent.java:193-201). Deviations, documented:
    UTC instead of JVM zone; fixed literal instead of now() so the
    result is deterministic."""
    cdc = cdc_view(spark, sf_dir)
    ms = F.when(F.col("cdc_seq") % 10 == 0, F.lit(None)).otherwise(F.col("ts_ms"))
    return cdc.select(
        "cdc_seq",
        F.coalesce(
            F.timestamp_millis(ms), F.lit("2024-02-01 00:00:00").cast("timestamp")
        ).alias("converted"),
    )


@register(
    "r14_to_json_preview",
    oracle=f"""
WITH {CDC_CTE}
SELECT cdc_seq,
       to_json(struct_pack(pk := pk, op := op, prop_k := prop_k)) AS preview
FROM cdc
""",
)
def r14_to_json_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row -> JSON preview for the event log display
    (createDataPreview, CdcSyncService.java:196-233)."""
    cdc = cdc_view(spark, sf_dir)
    return cdc.select(
        "cdc_seq",
        F.to_json(F.struct(F.col("pk"), F.col("op"), F.col("prop_k"))).alias(
            "preview"
        ),
    )


@register(
    "r15_variant_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
       'OBJECT<k: BIGINT>' AS payload_shape
FROM events
""",
)
def r15_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload handling via Spark 4's VARIANT type:
    parse the JSON payload ONCE into the binary variant encoding, then
    extract typed fields with ``variant_get`` and report the inferred
    shape with ``schema_of_variant`` — the schema-on-read path that
    replaces per-access ``get_json_object`` re-parsing (at 100 TB the
    difference between parsing each payload once and once PER FIELD;
    on a lake the variant column is stored shredded, so field access
    becomes columnar). The oracle pins the extraction result and the
    discovered shape against DuckDB's JSON reading of the same
    payloads."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select("event_id", F.parse_json("props").alias("v"))
    return parsed.select(
        "event_id",
        F.try_variant_get("v", "$.k", "bigint").alias("prop_k"),
        F.schema_of_variant("v").alias("payload_shape"),
    )
