"""Property tests for the manifest's append-schema merge
(sinks/manifest._merge_schemas): for ANY parent/append schema pair the
merge must preserve the parent's column order, append new columns in
the append frame's order, never invent or drop a column, be idempotent,
refuse type conflicts regardless of the evolution opt-in, and gate new
columns on it. Pure-python (no Spark session), so the search is wide."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from db_loader_spark.sinks.manifest import _merge_schemas

_TYPES = st.sampled_from(["long", "double", "string", "boolean", "date"])
_NAMES = st.text(alphabet="abcdefg_", min_size=1, max_size=4)


def _schema(fields: dict) -> dict:
    return {
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": True, "metadata": {}}
            for n, t in fields.items()
        ],
    }


_FIELDS = st.dictionaries(_NAMES, _TYPES, min_size=1, max_size=6)


@given(parent=_FIELDS, new=_FIELDS)
@settings(max_examples=300, deadline=None)
def test_merge_schema_laws(parent, new):
    p, n = _schema(parent), _schema(new)
    conflict = any(
        name in parent and parent[name] != t for name, t in new.items()
    )
    adds = [name for name in new if name not in parent]
    if conflict:
        # a type conflict is ALWAYS refused; with the opt-in it is
        # specifically the conflict that surfaces (new columns are
        # permitted, so nothing can mask it); without the opt-in the
        # refusal may name whichever violation appears first in the
        # appended frame — either way the commit never lands
        with pytest.raises(ValueError, match="implicit casts"):
            _merge_schemas(p, n, True, "root")
        with pytest.raises(ValueError):
            _merge_schemas(p, n, False, "root")
        return
    if adds:
        with pytest.raises(ValueError, match="merge_schema=True"):
            _merge_schemas(p, n, False, "root")
    else:
        # subset/equal appends merge to EXACTLY the parent contract
        assert _merge_schemas(p, n, False, "root") == p
    merged = _merge_schemas(p, n, True, "root")
    names = [f["name"] for f in merged["fields"]]
    # parent columns first in parent order, additions after in batch order
    assert names == list(parent) + adds
    types = {f["name"]: f["type"] for f in merged["fields"]}
    assert all(types[k] == v for k, v in parent.items())
    assert all(types[k] == new[k] for k in adds)
    # idempotent: re-appending the same frame evolves nothing further
    assert _merge_schemas(merged, n, True, "root") == merged
    # legacy lineage (no recorded parent schema) stays legacy
    assert _merge_schemas(None, n, True, "root") is None
