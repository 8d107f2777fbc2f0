"""Clojush log pipeline: text logs → experiments/experiment/generations/
summary (the reference's E1/E2 lifecycle, src/db_loader.clj:228-243).

One declarative plan per output table, all sharing the sectioned line
frame — Catalyst reuses the scan; the only shuffles are the per-file
sessionization window and the final per-run aggregates.

Reference bugs intentionally fixed (SURVEY.md §7): the
``[SUCCESS|FAILURE]`` char-class regex (P9), the NPE on summary-less
logs (we emit no summary row instead), unquoted CSV output (K1 — the
CSV sink quotes). Behavior is identical on well-formed logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from db_loader_spark.operators.ids import assign_file_ids
from db_loader_spark.operators.sessionize import route_sections, seq_split
from db_loader_spark.sources.text_logs import read_log_lines

MARKER = r"-\*-"  # generation header marker (src/db_loader.clj:171,231)
DELIM = r";+$"  # section delimiter (src/db_loader.clj:229)


def _kv_split(df: DataFrame, sep: str) -> DataFrame:
    """P1/P2/P4/P6: split 'key<sep>value' lines; keep only 2-arity rows;
    trim both sides (src/db_loader.clj:139-143,175-178)."""
    parts = F.split(F.col("line"), sep, 2)
    return (
        df.filter(F.col("line").contains(sep.replace("\\", "")))
        .withColumn("parameter", F.trim(parts.getItem(0)))
        .withColumn("value", F.trim(parts.getItem(1)))
        .filter((F.col("parameter") != "") & F.col("value").isNotNull())
    )


def parse_clojush_logs(
    spark: SparkSession,
    path: str,
    skip_nils: bool = True,
    id_mode: str = "hash",
    base_id: int = 0,
    user: str = "spark",
    problem_map: dict[str, str] | None = None,
    problem_name: str | None = None,
    persist_shared: bool = False,
) -> dict[str, DataFrame]:
    """Parse every log under ``path`` into the four output tables.

    Mirrors parse-log (src/db_loader.clj:228-243) per file, but as one
    distributed plan over all files at once (the reference looped a JVM
    per file, scripts/load_csv_to_cloud.sh:123).
    """
    lines = read_log_lines(spark, path, with_mtime=True)
    return parse_clojush_lines(
        spark,
        lines,
        skip_nils=skip_nils,
        id_mode=id_mode,
        base_id=base_id,
        user=user,
        problem_map=problem_map,
        problem_name=problem_name,
        persist_shared=persist_shared,
    )


def parse_clojush_lines(
    spark: SparkSession,
    lines: DataFrame,
    skip_nils: bool = True,
    id_mode: str = "hash",
    base_id: int = 0,
    user: str = "spark",
    problem_map: dict[str, str] | None = None,
    problem_name: str | None = None,
    persist_shared: bool = False,
) -> dict[str, DataFrame]:
    """Core plan over a (file, line_no, line[, file_mtime]) frame —
    shared by the batch path and the Structured Streaming foreachBatch
    path (streaming/file_ingest.py).

    ``persist_shared=True`` lazily localCheckpoints the routed line
    frame all four tables derive from and returns the handle under
    ``"_shared"``: a caller that MATERIALIZES every table (the CLI's
    four CSV appends, the streaming ingest's four per-batch writes)
    otherwise re-runs listing + gzip decode + the sessionize window
    + routing once PER TABLE. localCheckpoint, not ``.persist()``:
    an InMemoryRelation wrapping this plan (text scan broadcast-
    joined to a windowed aggregate of the same scan) measured 6-10×
    SLOWER than no caching at all on repeated runs — cache-build
    tasks sat blocked with ~0 CPU (runSum 113 s / cpuSum 0.5 s on one
    32-task stage) — while the lazy checkpoint materializes the same
    frame once as plain RDD blocks with none of that (measured 4.6 →
    3.8 s on the e2e fixture). Checkpoint blocks are released by the
    ContextCleaner when the caller drops the handle (there is no
    unpersist for checkpoints); callers hold it no longer than the
    write loop."""
    if "file_mtime" not in lines.columns:
        lines = lines.withColumn("file_mtime", F.lit(None).cast("timestamp"))
    lines = assign_file_ids(lines, mode=id_mode, base_id=base_id)
    sectioned = seq_split(lines, DELIM)
    routed = route_sections(sectioned, MARKER)
    if persist_shared:
        routed = routed.localCheckpoint(eager=False)

    # --- experiment (EAV header params, src/db_loader.clj:139-143) ----
    header = routed.filter(F.col("section_kind") == "header")
    header_kv = _kv_split(header, " = ")  # shared with experiments below
    experiment = header_kv.select("id", "parameter", "value")
    if skip_nils:  # P5 (src/db_loader.clj:141-142)
        experiment = experiment.filter(F.trim(F.col("value")) != "nil")

    # --- generations (EAV + gennum, src/db_loader.clj:169-178) --------
    gen_rows = routed.filter(F.col("section_kind") == "generation")
    sec_w = W.partitionBy("file", "section_id")
    gen_rows = gen_rows.withColumn(
        "gennum",
        F.max(
            F.when(
                F.col("line").rlike(MARKER),
                F.regexp_extract(F.col("line"), r"(\d+)\s*$", 1).cast("int"),
            )
        ).over(sec_w),
    ).filter(~F.col("line").rlike(MARKER))
    generations = _kv_split(gen_rows, ": ").select("id", "gennum", "parameter", "value")
    if skip_nils:
        generations = generations.filter(F.trim(F.col("value")) != "nil")

    # --- summary (src/db_loader.clj:204-209, regex fixed) -------------
    summary_src = routed.filter(F.col("section_kind") == "summary")
    status = F.regexp_extract(F.col("line"), r"(SUCCESS|FAILURE) at generation (\d+)", 1)
    maxgen = F.regexp_extract(F.col("line"), r"(SUCCESS|FAILURE) at generation (\d+)", 2)
    summary = (
        summary_src.filter(status != "")
        .groupBy("id")
        .agg(
            F.max(status == "SUCCESS").alias("successp"),
            F.max(maxgen.cast("int")).alias("maxgen"),
        )
    )

    # --- experiments (context row per run, src/db_loader.clj:103-118) -
    version = F.max(
        F.when(F.col("parameter") == "Clojush version", F.col("value"))
    )  # P10 find-first — params are unique per header
    agg_cols = [
        F.first("file_mtime").alias("rundate"),
        version.alias("clojush_version"),
        F.max(F.when(F.col("parameter") == "problem-name", F.col("value"))).alias(
            "problem_name"
        ),
    ]
    experiments = (
        header_kv.groupBy("id", "file")
        .agg(*agg_cols)
        .withColumn("user", F.lit(user))
        .withColumn("logfile_location", F.col("file"))
        .withColumn("csv_write_time", F.current_timestamp())
    )
    if problem_name is not None:  # CLI :problemname override (P19)
        experiments = experiments.withColumn("problem_name", F.lit(problem_name))
    # JN6: problem_name → problem_id via the config dimension map
    pmap = problem_map or {}
    if pmap:
        dim = spark.createDataFrame(
            list(pmap.items()), "problem_name string, problem_id string"
        )
        experiments = experiments.join(F.broadcast(dim), "problem_name", "left")
    else:
        experiments = experiments.withColumn("problem_id", F.lit(None).cast("string"))
    experiments = experiments.select(
        "id",
        "user",
        F.col("rundate").cast("timestamp").alias("rundate"),
        "problem_name",
        "problem_id",
        "clojush_version",
        "logfile_location",
        "csv_write_time",
    )

    tables = {
        "experiments": experiments,
        "experiment": experiment,
        "generations": generations,
        "summary": summary,
    }
    if persist_shared:
        tables["_shared"] = routed
    return tables


def append_sidecar_params(
    spark: SparkSession, experiment: DataFrame, lines_with_ids: DataFrame, index_path: str
) -> DataFrame:
    """JN5/S5: join the EDN sidecar's argmaps to runs by filename uuid and
    append as extra EAV rows (load-other-params, src/db_loader.clj:282-292)."""
    from db_loader_spark.sources.edn_index import read_edn_index

    index = read_edn_index(spark, index_path)
    # uuid comes from the BASENAME — a directory component containing
    # '_…'.' would otherwise match first and yield a wrong uuid
    basename = F.element_at(F.split(F.col("file"), "/"), -1)
    file_ids = (
        lines_with_ids.select("file", "id")
        .distinct()
        .withColumn("uuid", F.regexp_extract(basename, r"_([^_.]+)\.", 1))
    )
    extra = file_ids.join(F.broadcast(index), "uuid").select("id", "parameter", "value")
    return experiment.unionByName(extra)
