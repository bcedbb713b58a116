"""Synthesize a ~sf1.0-scale documents/embeddings pair for SCALE
VALIDATION ONLY (bench_extra A/B). Distributions approximate the
sf0.1 fixtures (doc length, vocab Zipf, dim-64 embeddings) at 10x
rows with deterministic seeds; other tables are symlinked from sf0.1
(the validated queries never read them)."""
import os, sys
sys.path.insert(0, "/root/repo")
from marc_data_migration_spark.session import get_spark
from pyspark.sql import functions as F

OUT = "/root/synth10"
os.makedirs(OUT, exist_ok=True)
spark = get_spark("synth10", parallelism=32, shuffle_partitions=32)

# inspect sf0.1 docs to mimic scale
src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
n_docs_src = src.count()
avg_len = src.select(F.avg(F.size(F.split("text", " ")))).first()[0]
print("sf0.1 docs:", n_docs_src, "avg words:", avg_len)

n_docs = n_docs_src * 10
# Zipf-ish vocab: word w_k picked via pow-law over 8000 words
docs = spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(int(avg_len))),
            lambda i: F.concat(
                F.lit("w"),
                (
                    F.floor(
                        F.pow(
                            F.pmod(F.xxhash64(F.col("id"), i), 100000) / 100000.0,
                            3.0,
                        )
                        * 8000
                    )
                ).cast("string"),
            ),
        ),
    ).alias("text"),
)
docs.coalesce(1).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

semb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
n_emb_src = semb.count()
print("sf0.1 embeddings:", n_emb_src, "cols:", semb.columns)
n_emb = n_emb_src * 10
emb = spark.range(n_emb).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda j: (F.pmod(F.xxhash64(F.col("id"), j), 2000) - 1000) / 1000.0,
    ).alias("embedding"),
)
emb.coalesce(1).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")

for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
print("done")
spark.stop()
