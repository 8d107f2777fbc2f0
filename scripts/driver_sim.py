"""Simulate the external driver: vanilla SparkSession, foreign cwd."""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .appName("driver-sim")
    .getOrCreate()
)

import __spark_entry__ as e

df = e.entry(spark)
rows = df.count()
print(f"entry(): {rows} rows, schema={df.schema.simpleString()}")
assert rows >= 0

from db_loader_spark.oracle import run_all

sample = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",
    "ann_sq_rerank",
    "dedup_embedding_lsh",
    "ecj_star",          # events table: ts decode in a VANILLA session
    "text_tfidf_topterms",
    "t_session_window",  # events again, different decode path
    "text_decontaminate",    # r4: shingle broadcast join
    "curation_select",       # r4: components + quality composition
    "curation_shard_assign", # r4: scan-side hash sharding
    "ann_ivf_topk",          # r4: session-scoped index cache on a vanilla session
    "g_pagerank",            # r6: iterative lazy chain + tracked caches
    "t_snapshot_upsert",     # r6: manifest publish/merge from a foreign cwd
    "e2e_cli_ingest",        # r7: main() CLI path driven from a foreign cwd
    "t_stream_lakehouse",    # r7: foreachBatch closure pickling (manifest pub)
    "t_stream_sessions",     # r7: stateful operator closure from a foreign cwd
    "text_pack_bins",        # r7: blocked prefix sum + tracked block frame
]
results = run_all(spark, "/root/testdata/sf0.01", only=sample)
bad = [r for r in results if not r.ok]
for r in results:
    print(("OK  " if r.ok else "FAIL"), r.name, r.spark_rows, r.detail)
print("DRIVER-SIM", "PASS" if not bad else "FAIL")
sys.exit(1 if bad else 0)
