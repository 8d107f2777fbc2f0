"""Config store (S10/K9): EDN round-trip, id counter, problem
registration, and the CLI wiring that resolves problem_id from it
(reference load-config/save-config, src/db_loader.clj:67-84,325-327)."""

from __future__ import annotations

from db_loader_spark.__main__ import main
from db_loader_spark.config import Config, load_config, render_edn, save_config
from db_loader_spark.sources.edn_index import parse_edn

LOG = """\
p1 = v1
problem-name = demo
Clojush version = 1.2
;;;;;;;;;;
;; -*- Report at generation 0
f: 7
;;;;;;;;;;
SUCCESS at generation 0
"""


def test_missing_file_gives_defaults(tmp_path):
    cfg = load_config(str(tmp_path / "nope"))
    assert cfg.id == 0
    assert cfg.problem_data == {"unspecified": "-1"}
    assert cfg.data_dir.endswith("data_dir/")


def test_round_trip_and_id_bump(tmp_path):
    path = str(tmp_path / ".db_config")
    cfg = Config(id=3, user="etosch", data_dir="/data/", problem_data={"a": "1"})
    save_config(path, cfg)
    back = load_config(path)
    assert back.id == 4  # save-config bumps the counter
    assert back.user == "etosch"
    assert back.data_dir == "/data/"
    assert back.problem_data == {"a": "1"}


def test_problem_registration_max_plus_one(tmp_path):
    path = str(tmp_path / ".db_config")
    cfg = Config(problem_data={"unspecified": "-1", "a": "4", "b": "2"})
    updated = save_config(path, cfg, problemname="regression")
    assert updated.problem_data["regression"] == "5"  # max(4)+1
    # already-registered name is NOT renumbered
    again = save_config(path, updated, problemname="a")
    assert again.problem_data["a"] == "4"


def test_render_edn_escaping():
    edn = render_edn({'k "q"': "v\\w"})
    assert parse_edn(edn) == {'k "q"': "v\\w"}


def test_cli_resolves_problem_id_from_config(spark, tmp_path):
    log = tmp_path / "run_u1.log"
    log.write_text(LOG)
    out = tmp_path / "csv"
    out.mkdir()
    conf = tmp_path / "db_config"
    conf.write_text('{:id 7 :user "confuser" :data_dir "ignored/" '
                    ':problem_data {"demo" "42"}}')
    rc = main(
        [
            ":filename", str(log),
            ":csv-dir", str(out),
            ":problemname", "demo",
            ":config", str(conf),
        ]
    )
    assert rc == 0
    exp = spark.read.option("header", True).csv(str(out / "experiments"))
    [row] = exp.collect()
    assert row.problem_id == "42"  # JN6 resolved from the config store
    assert row.user == "confuser"  # config user default
    back = load_config(str(conf))
    assert back.id == 8  # counter bumped by the load


def test_cli_registers_new_problem(tmp_path):
    log = tmp_path / "run_u1.log"
    log.write_text(LOG)
    out = tmp_path / "csv"
    out.mkdir()
    conf = tmp_path / "db_config"
    conf.write_text('{:problem_data {"unspecified" "-1" "old" "3"}}')
    rc = main(
        [
            ":filename", str(log),
            ":csv-dir", str(out),
            ":problemname", "brandnew",
            ":config", str(conf),
        ]
    )
    assert rc == 0
    back = load_config(str(conf))
    assert back.problem_data["brandnew"] == "4"
    # the SAME load already resolves the fresh id (registration happens
    # before the parse, reference order src/db_loader.clj:325-327)
    import duckdb
    [pid] = duckdb.sql(
        f"SELECT DISTINCT problem_id FROM read_csv_auto('{out}/experiments/*.csv', header=true)"
    ).fetchone()
    assert str(pid) == "4"


def test_cli_creates_config_with_sticky_data_dir(tmp_path):
    log = tmp_path / "run_u1.log"
    log.write_text(LOG)
    out = tmp_path / "csv"
    out.mkdir()
    conf = tmp_path / "fresh_config"
    rc = main(
        [":filename", str(log), ":csv-dir", str(out), ":config", str(conf)]
    )
    assert rc == 0
    back = load_config(str(conf))
    assert back.data_dir == str(out)  # this run's output dir, not ~/data_dir
    assert back.id == 1
