"""Property test: shingle_frame vs an independent pure-Python reference.

The shingle family underpins jaccard / MinHash / decontamination, and
r4 moved its dedup inside the array (array_distinct pre-explode) — this
pins the semantics against arbitrary text, not just the corpus: for any
input, the (id, shingle) set equals {distinct n-grams of the
lowercased, whitespace-split token stream}.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_loader_spark.functions.dedup import shingle_frame

# whitespace-heavy alphabet to stress the tokenizer's cleanup paths
_TEXT = st.text(
    alphabet=st.sampled_from(list("ab c\t\n:%.-é ")), min_size=0, max_size=60
)


def _py_shingles(text: str | None, n: int = 3) -> set[str]:
    toks = [t for t in (text or "").lower().strip().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=6))
def test_shingle_frame_matches_python(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set[str]] = {}
    for r in shingle_frame(docs).collect():
        got.setdefault(r["id"], set()).add(r["shingle"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_shingles(t), (i, t)
