"""Iceberg MERGE sink — the production sink (north_rule: "lake upsert
... exactly-once sink" over Iceberg). The sandbox's PySpark has no
Iceberg runtime jar (SURVEY.md §7 risk 1), so this module:

- generates the exact ``MERGE INTO`` SQL the engine runs on a real
  cluster (unit-tested as text);
- activates only when an Iceberg catalog is configured
  (``is_available``); otherwise ``ParquetMergeSink`` is the drop-in
  (same ``apply_merge`` contract, same semantics, tested against the
  same oracle).

On a real cluster the table is created
``PARTITIONED BY (bucket(N, conv_id))`` so MERGE touches only the
buckets a batch hits — identical I/O shape to the parquet sink's
dynamic-partition-overwrite emulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import KEY_COLS


def is_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is on the classpath+conf."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    confs = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") and "iceberg" in v.lower() for k, v in confs)


def create_table_sql(table: str, n_buckets: int = 256) -> str:
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n"
        "  conv_id string, turn_idx int, role string, text string,\n"
        "  tool string, ts timestamp, lsn bigint\n"
        f") USING iceberg PARTITIONED BY (bucket({n_buckets}, conv_id))\n"
        "TBLPROPERTIES ('write.merge.mode'='copy-on-write',\n"
        "               'write.distribution-mode'='hash')"
    )


def merge_sql(table: str, source_view: str, payload_cols: list[str]) -> str:
    """The MERGE the engine issues per micro-batch after max-LSN dedup.
    Field-level replace_and_add: non-null source columns overwrite
    (coalesce), the LSN guard makes replays no-ops, D deletes.
    (Reference semantics M1-M3, record_update.py:843-887.)"""
    on = " AND ".join(f"t.{k} = s.{k}" for k in KEY_COLS)
    sets = ", ".join(f"t.{c} = coalesce(s.{c}, t.{c})" for c in payload_cols)
    ins_cols = ", ".join(KEY_COLS + payload_cols + ["lsn"])
    ins_vals = ", ".join(f"s.{c}" for c in KEY_COLS + payload_cols + ["lsn"])
    return (
        f"MERGE INTO {table} t\n"
        f"USING {source_view} s\n"
        f"ON {on}\n"
        f"WHEN MATCHED AND s.op = 'D' AND s.lsn > t.lsn THEN DELETE\n"
        f"WHEN MATCHED AND s.op <> 'D' AND s.lsn > t.lsn AND s.gate_ok THEN\n"
        f"  UPDATE SET {sets}, t.lsn = s.lsn\n"
        f"WHEN NOT MATCHED AND s.op <> 'D' THEN\n"
        f"  INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def evolve_sql(table: str, new_cols: dict[str, str]) -> str:
    """Additive schema evolution (north_star: new tool/metadata columns):
    ALTER ADD COLUMNS; Iceberg back-fills reads with null."""
    cols = ", ".join(f"{c} {t}" for c, t in new_cols.items())
    return f"ALTER TABLE {table} ADD COLUMNS ({cols})"


class IcebergMergeSink:
    """Same contract as ParquetMergeSink; requires a live catalog."""

    def __init__(self, spark: SparkSession, table: str, n_buckets: int = 256):
        if not is_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on classpath — use ParquetMergeSink "
                "(same semantics) or submit with the iceberg-spark-runtime jar"
            )
        self.spark = spark
        self.table = table
        self.n_buckets = n_buckets
        spark.sql(create_table_sql(table, n_buckets))

    def apply_merge(self, batch_df: DataFrame, batch_id: int, payload_cols: list[str]) -> None:
        view = f"_changes_batch_{batch_id}"
        batch_df.createOrReplaceTempView(view)
        self.spark.sql(merge_sql(self.table, view, payload_cols))
