"""Explicit StructTypes for the engine's relational outputs.

Mirrors the reference's declared column sets — Clojush path
(``src/db_loader.clj:36-40``) and ECJ/Postgres DDL
(``scripts/create_tables.sql:1-54``) — with real types instead of
all-varchar EAV (SURVEY.md §1.3): gennum/maxgen are INT, successp is
BOOLEAN, rundate/csv_write_time are TIMESTAMP.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Clojush path (src/db_loader.clj:36-40) -------------------------------

EXPERIMENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("user", T.StringType(), True),
        T.StructField("rundate", T.TimestampType(), True),
        T.StructField("problem_name", T.StringType(), True),
        T.StructField("problem_id", T.StringType(), True),
        T.StructField("clojush_version", T.StringType(), True),
        T.StructField("logfile_location", T.StringType(), True),
        T.StructField("csv_write_time", T.TimestampType(), True),
    ]
)

EXPERIMENT_SCHEMA = T.StructType(  # EAV long format (src/db_loader.clj:37)
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("parameter", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

GENERATIONS_SCHEMA = T.StructType(  # EAV + gennum (src/db_loader.clj:38)
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("gennum", T.IntegerType(), False),
        T.StructField("parameter", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

SUMMARY_SCHEMA = T.StructType(  # (src/db_loader.clj:39)
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("successp", T.BooleanType(), True),
        T.StructField("maxgen", T.IntegerType(), True),
    ]
)

# --- ECJ path (scripts/create_tables.sql, re-expressed: ids are BIGINT
# because the engine's default run ids are 63-bit file hashes and serial
# INT counters overflow at 100 TB anyway; batchdate is the reference's
# formatted "yyyy-MM-dd HH:mm" STRING; experiment carries logname per
# the reference insert columns. MUST stay in lockstep with
# sinks.ddl.ECJ_TABLES — tests/test_ecj_load.py asserts the load_ecj
# output matches that DDL contract.) ----------------------------------

USERS_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.LongType(), False),
        T.StructField("username", T.StringType(), False),
        T.StructField("password", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
    ]
)

SYSTEMS_SCHEMA = T.StructType(
    [
        T.StructField("sysid", T.LongType(), False),
        T.StructField("sysname", T.StringType(), False),
        T.StructField("version", T.StringType(), True),
        T.StructField("githash", T.StringType(), True),
    ]
)

PROBLEMS_SCHEMA = T.StructType(
    [
        T.StructField("probid", T.LongType(), False),
        T.StructField("sysid", T.LongType(), True),
        T.StructField("probname", T.StringType(), False),
        T.StructField("githash", T.StringType(), True),
    ]
)

LOCATIONS_SCHEMA = T.StructType(
    [
        T.StructField("locid", T.LongType(), False),
        T.StructField("location", T.StringType(), False),
        T.StructField("loginid", T.StringType(), True),
    ]
)

BATCHES_SCHEMA = T.StructType(  # "experiments" in create_tables.sql:29-38
    [
        T.StructField("batchid", T.LongType(), False),
        T.StructField("userid", T.LongType(), True),
        T.StructField("probid", T.LongType(), True),
        T.StructField("locid", T.LongType(), True),
        T.StructField("batchdate", T.StringType(), True),
    ]
)

ECJ_EXPERIMENT_SCHEMA = T.StructType(  # create_tables.sql:40-46 + logname
    [
        T.StructField("expid", T.LongType(), False),
        T.StructField("logname", T.StringType(), True),
        T.StructField("batchid", T.LongType(), True),
        T.StructField("param", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

ECJ_GENERATIONS_SCHEMA = T.StructType(  # create_tables.sql:48-54
    [
        T.StructField("genid", T.LongType(), False),
        T.StructField("expid", T.LongType(), True),
        T.StructField("param", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

# Raw log-line frame produced by sources.text_logs (FIXTURES.md §A1)
LOG_LINES_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("line_no", T.LongType(), False),
        T.StructField("line", T.StringType(), True),
    ]
)
