"""Property test: the block-partitioned packing prefix sum
(textops.pack_doc_bins) vs the single-window reference formulation.

The r7 rewrite distributes the per-language running sum over fixed
doc_id blocks; its correctness claim is exact equivalence — offset +
in-block cumsum ≡ the global per-lang cumsum row for row, for ANY doc
set (sparse ids, ids straddling block boundaries, one-language skew,
zero-token docs, token counts larger than the budget)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_loader_spark.queries.textops import PACK_BLOCK, pack_doc_bins

_DOC = st.tuples(
    # ids spread far beyond one block so block boundaries are exercised
    st.integers(min_value=0, max_value=3 * PACK_BLOCK),
    st.sampled_from(["en", "fr"]),
    st.integers(min_value=0, max_value=700),
)


def _py_bins(rows: list[tuple[int, str, int]], budget: int) -> dict[int, int]:
    """The reference formulation: global per-lang cumulative sum in
    doc_id order, bin = floor(cum_before / budget)."""
    out: dict[int, int] = {}
    for lang in {r[1] for r in rows}:
        cum = 0
        for doc_id, _, n_tok in sorted(r for r in rows if r[1] == lang):
            out[doc_id] = cum // budget
            cum += n_tok
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_DOC, min_size=1, max_size=60, unique_by=lambda d: d[0]),
       budget=st.sampled_from([1, 7, 256]))
def test_pack_doc_bins_matches_global_formulation(spark, docs, budget):
    from db_loader_spark import cache

    df = spark.createDataFrame(docs, "doc_id long, lang string, n_tok int")
    got = {
        r["doc_id"]: r["bin_id"]
        for r in pack_doc_bins(df, budget).collect()
    }
    cache.release()  # pack_doc_bins tracks its block frame; tests drain it
    assert got == _py_bins(docs, budget)
