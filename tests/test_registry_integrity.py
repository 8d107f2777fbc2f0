"""Driver-contract guards: the external driver consumes the registry,
bench headline list, and entry file blindly — these tests fail fast on
the drift that would otherwise only surface in the driver's round run."""

from __future__ import annotations

import inspect

from pyspark.sql import functions as F


def test_every_registry_entry_well_formed():
    from db_loader_spark.queries import all_queries

    qs = all_queries()
    assert len(qs) >= 72
    for name, spec in qs.items():
        assert callable(spec.spark), name
        # the driver calls q(spark, sf_dir) positionally
        params = [
            p
            for p in inspect.signature(spec.spark).parameters.values()
            if p.default is inspect.Parameter.empty
        ]
        assert len(params) == 2, f"{name}: signature must be (spark, sf_dir)"
        assert spec.oracle is None or (
            isinstance(spec.oracle, str) and "SELECT" in spec.oracle.upper()
        ), f"{name}: oracle must be SQL or None"


def test_driver_window_is_exactly_sized_and_fronted():
    """The driver witnesses exactly the first DRIVER_WINDOW_SIZE
    registry keys: WINDOW must hold exactly that many names, NEXT_UP
    must follow immediately, and neither may overlap the other or name
    a key outside the registry — a miscounted window edit silently
    changes which keys get external evidence."""
    from db_loader_spark.queries import (
        DRIVER_WINDOW_SIZE,
        NEXT_UP,
        WINDOW,
        all_queries,
        diagnostic_queries,
    )

    assert len(WINDOW) == DRIVER_WINDOW_SIZE
    assert not set(WINDOW) & set(NEXT_UP)
    ordered = list(all_queries())
    assert ordered[:DRIVER_WINDOW_SIZE] == WINDOW
    assert ordered[DRIVER_WINDOW_SIZE : DRIVER_WINDOW_SIZE + len(NEXT_UP)] == NEXT_UP
    # diagnostics live outside the driver registry entirely
    assert not set(diagnostic_queries()) & set(ordered)


def test_bench_headline_names_resolve():
    """A renamed query must break HERE, not in the driver's bench run."""
    import bench
    from db_loader_spark.queries import all_queries

    qs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == []


def test_entry_module_contract():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle the driver runs is a non-empty SQL string
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())


def test_sq_rerank_recall_is_exact(spark, sf_dir):
    """VERDICT r01 #3 acceptance: the engine must ship an ANN arm with
    recall ≥ 0.9 at k=3. SQ-rerank is that arm — on this corpus it is
    EXACT (1.0); a drop means the surrogate-candidate margin broke."""
    from db_loader_spark.queries.similarity import ann_recall

    rec = (
        ann_recall(spark, sf_dir)
        .filter(F.col("method") == "sq")
        .agg(F.min("recall_at_3").alias("worst"))
        .collect()[0]
    )
    assert rec.worst == 1.0


def test_bench_deadline_sheds_samples_never_rows():
    """r10: the soft budget degrades SAMPLE COUNT when the projected
    final wall exceeds budget minus the tail reserve; a healthy
    projection keeps full N_TIMED, and a zero/negative budget means
    "no deadline" rather than instant degradation (the guard for a
    misconfigured env var). r11 (ADVICE r10): the 1-sample tier
    anchors at the BUDGET — the old room*1.2 boundary (864 s) sat
    above the 780 s budget, so a run already projected past the
    number the shedding insures against still kept 2 samples."""
    import bench

    room = 780 - bench.TAIL_RESERVE_S
    assert bench._samples_for_projection(0.0, 780) == bench.N_TIMED
    # r9-weather healthy wall (~620 s) must NOT degrade at the default
    assert bench._samples_for_projection(620.0, 780) == bench.N_TIMED
    assert bench._samples_for_projection(room, 780) == bench.N_TIMED
    assert bench._samples_for_projection(room + 1, 780) == 2
    # a projection at the budget keeps 2 samples; past it drops to 1
    assert bench._samples_for_projection(780.0, 780) == 2
    assert bench._samples_for_projection(780.1, 780) == 1
    assert bench._samples_for_projection(room * 1.2, 780) == 1
    assert bench._samples_for_projection(1e9, 780) == 1
    # no-deadline sentinel: budget <= 0 never degrades
    assert bench._samples_for_projection(1e9, 0) == bench.N_TIMED
    assert bench._samples_for_projection(1e9, -1) == bench.N_TIMED
