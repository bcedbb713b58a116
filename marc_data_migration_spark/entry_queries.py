"""Driver-contract queries + DuckDB oracles (__spark_entry__).

Each SURVEY.md §2 operator gets a (spark_fn, oracle_sql) pair over the
driver's read-only testdata tables. The CDC operators run on a change
feed derived *deterministically* from the `events` table (no external
data): event_id→lsn, user_id→conv_id, event_type→op/role/tool — so the
Spark engine path and the DuckDB SQL compute the same ground truth.

Conventions for driver hash-match parity:
- every computed column aliased identically in Spark and SQL;
- timestamps surfaced as epoch microseconds (bigint) — Spark and
  DuckDB stringify raw timestamps differently;
- doubles rounded to 4 decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.normalize import (
    extract_key_001,
    extract_key_035,
    key_with_precedence,
    normalize_text,
)
from .functions.similarity import jaccard_tokens, token_sort_ratio
from .operators.dedup import latest_per_key
from .operators.merge import apply_changes

# ---------------------------------------------------------------------
# CDC feed derivation (shared by engine side and oracle side)
# ---------------------------------------------------------------------


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def changes_from_events(events: DataFrame) -> DataFrame:
    """events → WAL change feed: lsn=event_id, key=(user conv, event_id%20),
    op: error→D, signup→I, else U; D rows carry null payload."""
    op = (
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
    )
    role = (
        F.when(F.col("event_type") == "view", "user")
        .when(F.col("event_type") == "click", "assistant")
        .when(F.col("event_type") == "purchase", "tool")
        .when(F.col("event_type") == "signup", "system")
    )
    is_del = F.col("event_type") == "error"
    return events.select(
        op.alias("op"),
        F.col("event_id").alias("lsn"),
        F.col("ts").alias("commit_ts"),
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.col("event_id") % 20).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.when(~is_del, F.col("props")).alias("text"),
        F.when(~is_del, F.col("event_type")).alias("tool"),
        F.when(~is_del, F.col("ts")).alias("ts"),
    )


def base_from_events(events: DataFrame) -> DataFrame:
    """Initial lake state: every 4th event, deduped per key by max lsn."""
    ch = changes_from_events(events.filter(F.col("event_id") % 4 == 0))
    latest = latest_per_key(ch.filter(F.col("op") != "D"))
    return latest.select("conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn")


# The same derivation in DuckDB SQL (CTE prefix reused by CDC oracles).
CDC_CTES = """
WITH changes AS (
  SELECT
    CASE WHEN event_type = 'error' THEN 'D'
         WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
    event_id AS lsn,
    ts AS commit_ts,
    'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(event_id % 20 AS INT) AS turn_idx,
    CASE WHEN event_type = 'view' THEN 'user'
         WHEN event_type = 'click' THEN 'assistant'
         WHEN event_type = 'purchase' THEN 'tool'
         WHEN event_type = 'signup' THEN 'system' END AS role,
    CASE WHEN event_type <> 'error' THEN props END AS text,
    CASE WHEN event_type <> 'error' THEN event_type END AS tool,
    CASE WHEN event_type <> 'error' THEN ts END AS ts
  FROM events
),
base AS (
  SELECT conv_id, turn_idx, role, text, tool, ts, lsn FROM (
    SELECT c.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
    FROM changes c
    WHERE lsn % 4 = 0 AND op <> 'D'
  ) WHERE rn = 1
),
latest AS (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
    FROM changes c
  ) WHERE rn = 1
)
"""

# ---------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _us(col):
    # testdata parquet timestamps load as TIMESTAMP_NTZ; with the session
    # pinned to UTC the cast is identity and matches DuckDB's epoch_us.
    return F.unix_micros(F.col(col).cast("timestamp")).alias(f"{col}_us")


# -- EP1 flagship: full CDC MERGE apply (W1+J1+M1-M3+F4) ---------------


@query(
    "cdc_apply",
    CDC_CTES
    + """
, merged AS (
  SELECT
    coalesce(c.conv_id, t.conv_id) AS conv_id,
    coalesce(c.turn_idx, t.turn_idx) AS turn_idx,
    c.lsn IS NOT NULL AND (t.lsn IS NULL OR c.lsn > t.lsn) AS fresh,
    t.lsn IS NOT NULL AS has_t,
    c.op AS op,
    CASE WHEN fresh AND c.op <> 'D' THEN coalesce(c.role, t.role) ELSE t.role END AS role,
    CASE WHEN fresh AND c.op <> 'D' THEN coalesce(c.text, t.text) ELSE t.text END AS text,
    CASE WHEN fresh AND c.op <> 'D' THEN coalesce(c.tool, t.tool) ELSE t.tool END AS tool,
    CASE WHEN fresh AND c.op <> 'D' THEN coalesce(c.ts, t.ts) ELSE t.ts END AS ts,
    CASE WHEN fresh AND c.op <> 'D' THEN c.lsn ELSE t.lsn END AS lsn
  FROM base t FULL OUTER JOIN latest c
    ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx
)
SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us, lsn
FROM merged
WHERE NOT (fresh AND has_t AND op = 'D')
  AND (has_t OR (fresh AND op <> 'D'))
""",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    res = apply_changes(base_from_events(ev), changes_from_events(ev))
    return res.final.select(
        "conv_id", "turn_idx", "role", "text", "tool", _us("ts"), "lsn"
    )


# -- W1: max-LSN dedup window ------------------------------------------


@query(
    "cdc_dedup_max_lsn",
    CDC_CTES
    + """
SELECT conv_id, turn_idx, op, lsn, text, epoch_us(commit_ts) AS commit_ts_us
FROM latest
""",
)
def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = changes_from_events(_events(spark, sf_dir))
    return latest_per_key(ch).select(
        "conv_id", "turn_idx", "op", "lsn", "text", _us("commit_ts")
    )


# -- A1: duplicate-key aggregation (GROUP BY HAVING count>1) -----------


@query(
    "cdc_dup_keys",
    CDC_CTES
    + """
SELECT conv_id, turn_idx, count(*) AS n_versions, max(lsn) AS max_lsn
FROM changes GROUP BY conv_id, turn_idx HAVING count(*) > 1
""",
)
def q_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = changes_from_events(_events(spark, sf_dir))
    return (
        ch.groupBy("conv_id", "turn_idx")
        .agg(F.count("*").alias("n_versions"), F.max("lsn").alias("max_lsn"))
        .filter(F.col("n_versions") > 1)
    )


# -- F4/A2: routing + run-summary counters -----------------------------


@query(
    "cdc_route_counts",
    CDC_CTES
    + """
SELECT route, count(*) AS n FROM (
  SELECT CASE
    WHEN c.op = 'D' AND t.lsn IS NOT NULL AND c.lsn > t.lsn THEN 'deleted'
    WHEN c.op = 'D' AND t.lsn IS NULL THEN 'delete-noop'
    WHEN t.lsn IS NOT NULL AND c.lsn <= t.lsn THEN 'stale'
    WHEN t.lsn IS NOT NULL THEN 'updated'
    ELSE 'non-updated' END AS route
  FROM latest c LEFT JOIN base t
    ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx
) GROUP BY route
""",
)
def q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    res = apply_changes(base_from_events(ev), changes_from_events(ev))
    return res.routed.groupBy("route").agg(F.count("*").alias("n"))


# -- J1: lookup join -----------------------------------------------------


@query(
    "cdc_lookup_join",
    CDC_CTES
    + """
SELECT c.op AS op, t.lsn IS NOT NULL AS matched, count(*) AS n,
       round(avg(CAST(c.lsn AS DOUBLE)), 4) AS avg_lsn
FROM latest c LEFT JOIN base t
  ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx
GROUP BY c.op, t.lsn IS NOT NULL
""",
)
def q_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    base = base_from_events(ev)
    latest = latest_per_key(changes_from_events(ev))
    t = base.select(
        F.col("conv_id").alias("t_conv_id"),
        F.col("turn_idx").alias("t_turn_idx"),
        F.col("lsn").alias("t_lsn"),
    )
    j = latest.join(
        t,
        (latest.conv_id == t.t_conv_id) & (latest.turn_idx == t.t_turn_idx),
        "left_outer",
    )
    return (
        j.groupBy("op", F.col("t_lsn").isNotNull().alias("matched"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("lsn").cast("double")), 4).alias("avg_lsn"),
        )
    )


# -- P1-P3: key extraction ----------------------------------------------


@query(
    "key_extraction",
    """
WITH raw AS (
  SELECT event_id,
    CASE event_id % 5
      WHEN 0 THEN 'ocm' || CAST(event_id AS VARCHAR)
      WHEN 1 THEN 'x' || CAST(event_id AS VARCHAR)
      WHEN 2 THEN 'on' || CAST(event_id AS VARCHAR) || '  '
      WHEN 3 THEN CAST(event_id AS VARCHAR)
      ELSE 'junk' || CAST(event_id AS VARCHAR) END AS f001,
    CASE WHEN event_id % 3 = 0
         THEN '(OCoLC)ocn' || CAST(event_id AS VARCHAR) END AS f035
  FROM events
),
extracted AS (
  SELECT event_id,
    CASE WHEN regexp_full_match(k001, '\\d+') THEN k001 END AS key_001,
    CASE WHEN regexp_full_match(k035, '\\d+') THEN k035 END AS key_035
  FROM (
    SELECT event_id,
      trim(regexp_replace(regexp_replace(trim(f001), '\\W+\\d+$', '', 'g'),
                          '(?i)^(ocolc|ocn|ocm|on)+', '', 'g')) AS k001,
      trim(regexp_replace(
        trim(CASE WHEN regexp_matches(f035, '(?i)\\(ocolc\\)')
                  THEN regexp_replace(f035, '(?i)\\(ocolc\\)', '', 'g') END),
        '(?i)^(ocolc|ocn|ocm|on)+', '', 'g')) AS k035
    FROM raw
  )
)
SELECT event_id, coalesce(key_035, key_001) AS key
FROM extracted WHERE coalesce(key_035, key_001) IS NOT NULL
""",
)
def q_key_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    eid = F.col("event_id")
    f001 = (
        F.when(eid % 5 == 0, F.concat(F.lit("ocm"), eid.cast("string")))
        .when(eid % 5 == 1, F.concat(F.lit("x"), eid.cast("string")))
        .when(eid % 5 == 2, F.concat(F.lit("on"), eid.cast("string"), F.lit("  ")))
        .when(eid % 5 == 3, eid.cast("string"))
        .otherwise(F.concat(F.lit("junk"), eid.cast("string")))
    )
    f035 = F.when(eid % 3 == 0, F.concat(F.lit("(OCoLC)ocn"), eid.cast("string")))
    key = key_with_precedence(extract_key_035(f035), extract_key_001(f001))
    return ev.select("event_id", key.alias("key")).filter(F.col("key").isNotNull())


# -- F1/F2: normalization ------------------------------------------------


@query(
    "normalize_text",
    """
SELECT doc_id,
  trim(regexp_replace(
    regexp_replace(
      regexp_replace(lower(text), '[.,/#!$%^&*;:{}\\[\\]=\\-_`~()]', ' ', 'g'),
      '(?i)\\s(the|of|a|an|p|n)\\s', ' ', 'g'),
    '\\s{2,}', ' ', 'g')) AS norm
FROM documents
""",
)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", normalize_text("text").alias("norm"))


# -- A4: jaccard similarity (adjacent-doc pairs) --------------------------


@query(
    "jaccard_pairs",
    """
SELECT a.doc_id AS doc_id,
  round(CAST(len(list_distinct(list_intersect(string_split_regex(a.text, '\\s+'),
                                              string_split_regex(b.text, '\\s+')))) AS DOUBLE)
        / len(list_distinct(list_concat(string_split_regex(a.text, '\\s+'),
                                        string_split_regex(b.text, '\\s+')))), 4) AS jaccard
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
""",
)
def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.select(F.col("doc_id"), F.col("text").alias("a_text"))
    b = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("b_text"))
    return a.join(b, "doc_id").select(
        "doc_id", F.round(jaccard_tokens("a_text", "b_text"), 4).alias("jaccard")
    )


# -- TPC-H Q1-style agg (headline scan+agg) -------------------------------


# Money as integer cents: per-row double ops are bit-identical across
# engines, but multi-row double SUM order is not — at sf0.1 the
# accumulated reorder error exceeds any fixed rounding. Integer sums
# are exact and hash identically.
@query(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("sum_qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "sum_base_price_c"
            ),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
                    "bigint"
                )
            ).alias("sum_disc_price_c"),
            F.count("*").alias("count_order"),
        )
    )


# -- W-topk: top-3 orders per customer segment ----------------------------


@query(
    "topk_orders_per_segment",
    """
SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
    row_number() OVER (PARTITION BY c.c_mktsegment
                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rn <= 3
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )


# -- P8/A5: online classifier + conditional tallies -----------------------


@query(
    "online_classifier_counts",
    """
SELECT CASE WHEN event_type IN ('click', 'view') THEN TRUE ELSE FALSE END AS is_online,
       count(*) AS n,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view
FROM events GROUP BY 1
""",
)
def q_online(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.col("event_type").isin("click", "view").alias("is_online"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n_view"),
        )
    )


# -- exact dedup (hash-groupBy) -------------------------------------------


@query(
    "exact_dedup",
    """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


# -- J5/F3: fuzzy similarity scores (pandas UDF — no SQL oracle; the
#    driver records a rows-only check, SURVEY.md §2.3 J5) -----------------


@query("fuzzy_ratio_pairs")
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.select(F.col("doc_id"), F.col("text").alias("a_text"))
    b = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("b_text"))
    return a.join(b, "doc_id").select(
        "doc_id",
        token_sort_ratio(
            normalize_text("a_text"), normalize_text("b_text")
        ).alias("ratio"),
    )
