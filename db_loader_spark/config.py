"""Config store (S10/K9): the reference's ``~/.db_config`` EDN file.

The reference keeps loader state in an EDN map
(load-config/save-config, src/db_loader.clj:67-84):

    {:id 3 :user "etosch" :data_dir "/home/etosch/data_dir/"
     :problem_data {"unspecified" "-1" "regression" "1"}}

- ``:id`` — the dense run-id counter (K9). Our engine's default id mode
  is per-file hashing (operators/ids.py), which needs no persisted
  counter; the counter is kept for ``mode="dense"`` reference compat.
- ``:user`` / ``:data_dir`` — defaults for the CSV writer and the
  experiments context column.
- ``:problem_data`` — problem name → problem id, the JN6 dimension map;
  ``save_config`` registers a new problem under max(id)+1 exactly like
  the reference's swap! (src/db_loader.clj:81-84).

Round-trips through the same from-scratch EDN parser the sidecar index
uses (sources/edn_index.py). Fixed vs the reference: ``save-config``
there slurps the file unconditionally and crashes when it doesn't
exist (the docstring at src/db_loader.clj:17 promises creation); here a
missing file starts from the defaults.

This is driver-side config-scale state (one tiny file) — plain Python
file IO on purpose, never a Spark job.
"""

from __future__ import annotations

import getpass
import os
from dataclasses import dataclass, field

from db_loader_spark.sources.edn_index import Keyword, parse_edn


def default_config_path() -> str:
    """``DB_CONFIG_PATH`` overrides ``~/.db_config`` so test suites (and
    multi-tenant runs) never touch the real per-user store."""
    return os.environ.get("DB_CONFIG_PATH") or os.path.join(
        os.path.expanduser("~"), ".db_config"
    )


def _default_data_dir() -> str:
    return os.path.join(os.path.expanduser("~"), "data_dir") + os.sep


@dataclass
class Config:
    """In-memory image of the ``~/.db_config`` EDN map."""

    id: int = 0
    user: str = field(default_factory=getpass.getuser)
    data_dir: str = field(default_factory=_default_data_dir)
    problem_data: dict[str, str] = field(
        default_factory=lambda: {"unspecified": "-1"}
    )


def load_config(path: str | None = None) -> Config:
    """load-config (src/db_loader.clj:67-74): missing file → defaults;
    each key falls back independently."""
    path = path or default_config_path()
    raw: dict = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            raw = parse_edn(fh.read()) or {}
    cfg = Config()
    if "id" in raw:
        cfg.id = int(raw["id"])
    if "user" in raw:
        cfg.user = str(raw["user"])
    if "data_dir" in raw:
        cfg.data_dir = str(raw["data_dir"])
    if "problem_data" in raw:
        cfg.problem_data = {str(k): str(v) for k, v in raw["problem_data"].items()}
    return cfg


def render_edn(value) -> str:
    """Serialize the Python subset the config uses back to EDN."""
    if value is None:
        return "nil"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, Keyword):
        return f":{value}"
    if isinstance(value, str):
        escaped = value.replace("\\", "\\\\").replace('"', '\\"')
        return f'"{escaped}"'
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, dict):
        items = " ".join(
            f"{render_edn(k)} {render_edn(v)}" for k, v in value.items()
        )
        return "{" + items + "}"
    if isinstance(value, (list, tuple)):
        return "[" + " ".join(render_edn(v) for v in value) + "]"
    raise TypeError(f"cannot render {type(value).__name__} as EDN")


def save_config(
    path: str | None, cfg: Config, problemname: str | None = None
) -> Config:
    """save-config (src/db_loader.clj:76-84): bump the id counter and
    register ``problemname`` under max(problem id)+1 if unseen. Returns
    the updated config (also written to ``path``)."""
    path = path or default_config_path()
    problem_data = dict(cfg.problem_data)
    if problemname and problemname not in problem_data:
        # Tolerate hand-edited stores: non-numeric ids are skipped when
        # computing the max (mirrors load_config's per-key fallback).
        numeric = [
            int(v) for v in problem_data.values() if v.lstrip("-").isdigit()
        ]
        next_id = max(numeric) + 1 if numeric else 0
        problem_data[problemname] = str(next_id)
    updated = Config(
        id=cfg.id + 1, user=cfg.user, data_dir=cfg.data_dir, problem_data=problem_data
    )
    edn = render_edn(
        {
            Keyword("id"): updated.id,
            Keyword("user"): updated.user,
            Keyword("data_dir"): updated.data_dir,
            Keyword("problem_data"): updated.problem_data,
        }
    )
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(edn + "\n")
    return updated
