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
    "dedup_embedding_components",  # r8: lsh pairs + CC (lsh key demoted)
    "ecj_star",          # events table: ts decode in a VANILLA session
    "text_tfidf_topterms",
    "t_session_window",  # events again, different decode path
    "text_decontaminate",    # r4: shingle broadcast join
    "p_parse_suite",         # r8: six-parser tagged union frame
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

# EXTERNAL-EVIDENCE AUDIT (VERDICT r7 #1: CORRECTNESS_r07 came back
# as a 2-byte `{}` and the round's rotation ledger silently rode on
# it). An empty or unparseable driver artifact is a LOUD condition:
# the affected round has NO external rows, its window must be
# re-fronted, and round notes must not cite it as evidence.
import glob
import json

for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
    try:
        with open(path) as fh:
            payload = json.load(fh)
    except (OSError, ValueError):
        payload = None
    if not payload:
        print(
            f"WARNING: {path} is EMPTY/unreadable — that round has ZERO "
            "external correctness rows; re-front its window and do not "
            "cite it in round notes"
        )

print("DRIVER-SIM", "PASS" if not bad else "FAIL")
sys.exit(1 if bad else 0)
