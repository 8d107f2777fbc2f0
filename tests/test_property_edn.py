"""Property tests (hypothesis): the EDN renderer/parser round-trip that
the config store depends on, and CLI argmap parsing invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from db_loader_spark.__main__ import parse_argmap
from db_loader_spark.config import render_edn
from db_loader_spark.sources.edn_index import parse_edn

# The value subset the config file actually carries.
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.text(
        st.characters(blacklist_categories=("Cs",)), max_size=30
    ),
)
values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.text(
                st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=15
            ),
            children,
            max_size=4,
        ),
    ),
    max_leaves=12,
)


@given(values)
@settings(max_examples=200, deadline=None)
def test_edn_round_trip(v):
    """parse(render(v)) == v for the whole config value subset —
    including strings containing quotes, backslashes, braces, commas,
    and EDN keyword-looking text."""
    assert parse_edn(render_edn(v)) == v


@given(
    st.lists(
        st.tuples(
            st.text(
                st.characters(
                    blacklist_characters=":\r\n \t",
                    blacklist_categories=("Cs",),
                ),
                min_size=1,
                max_size=10,
            ),
            st.text(
                st.characters(
                    blacklist_characters="\r\n \t",
                    blacklist_categories=("Cs",),
                ).filter(lambda c: True),
                min_size=1,
                max_size=10,
            ).filter(lambda s: not s.startswith(":")),
        ),
        max_size=6,
        unique_by=lambda kv: kv[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_argmap_round_trip(pairs):
    """':k v' pair streams always parse back to exactly their dict."""
    argv: list[str] = []
    for k, v in pairs:
        argv.extend([f":{k}", v])
    assert parse_argmap(argv) == dict(pairs)
