"""Property test: the bigram LM score vs an independent pure-Python
reference on arbitrary corpora.

text_lm_score's oracle mirrors the SQL; this pins the SEMANTICS against
a from-scratch implementation: for any corpus, per-doc score =
round(mean over doc bigrams of ln(C(bigram)/C(first token)), 4), with
unigram counts over ALL docs and docs under two tokens excluded.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny vocabulary so bigrams genuinely repeat across docs
_TEXT = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=8
).map(" ".join)


def _py_lm(texts: list[str]) -> dict[int, tuple[int, float]]:
    toks = {i: [t for t in txt.lower().strip().split() if t] for i, txt in enumerate(texts)}
    uni: Counter = Counter()
    bg: Counter = Counter()
    for ts in toks.values():
        uni.update(ts)
    for ts in toks.values():
        if len(ts) >= 2:
            bg.update(zip(ts, ts[1:]))
    out = {}
    for i, ts in toks.items():
        if len(ts) < 2:
            continue
        terms = [math.log(bg[(a, b)] / uni[a]) for a, b in zip(ts, ts[1:])]
        out[i] = (len(terms), round(sum(terms) / len(terms), 4))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=6))
def test_lm_score_matches_python(spark, texts):
    from db_loader_spark.queries.textops import lm_score_of

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in lm_score_of(docs).collect()
    }
    want = _py_lm(texts)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], (i, texts)
        assert abs(got[i][1] - want[i][1]) <= 1e-4, (i, texts)
