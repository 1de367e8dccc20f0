"""Property-based tests for the glob compiler (hypothesis): paths
constructed by filling a glob's wildcards must match, and `captures` must
return exactly the fills. Complements the ported reference cases in
test_glob.py (GlobTest.scala) with randomized coverage of the same
semantics."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dig_aggregator_core_spark.functions.glob import Glob

# literal runs: no '*', no '/', drawn from the reference's validChar set
_lit = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-._",
    min_size=1,
    max_size=6,
)
# a wildcard fill must not contain '/' and must not contain the literal
# character that FOLLOWS the wildcard; keep fills to a disjoint alphabet
# (uppercase) so "stop at the next glob char" can't trigger early.
_fill = st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ", min_size=0, max_size=6)


@st.composite
def glob_and_fills(draw):
    """Build (glob, fills): alternating literal / '*' segments joined by
    optional path separators, always starting and ending with a literal so
    every '*' has a following delimiter (the semantics' simple regime)."""
    n = draw(st.integers(min_value=1, max_value=4))
    parts: list[str] = []
    fills: list[str] = []
    for i in range(n):
        parts.append(draw(_lit))
        if i < n - 1:
            sep = draw(st.sampled_from(["/", ""]))
            if draw(st.booleans()):
                parts.append("*")
                fills.append(draw(_fill))
            parts.append(sep)
    return "".join(parts), fills


def _fill_glob(glob: str, fills: list[str]) -> str:
    out, it = [], iter(fills)
    for ch in glob:
        out.append(next(it) if ch == "*" else ch)
    return "".join(out)


@given(glob_and_fills())
@settings(max_examples=300, deadline=None)
def test_filled_glob_matches_and_captures(gf):
    glob_s, fills = gf
    g = Glob(glob_s)
    path = _fill_glob(glob_s, fills)
    assert g.matches(path), (glob_s, path)
    assert g.captures(path) == fills, (glob_s, path)


@given(glob_and_fills(), _lit)
@settings(max_examples=200, deadline=None)
def test_partial_match_accepts_extension(gf, suffix):
    """Prefix mode (Glob.scala:64-66): a matching path extended past the
    glob still prefix-matches."""
    glob_s, fills = gf
    g = Glob(glob_s)
    path = _fill_glob(glob_s, fills)
    assert g.matches(path + "/" + suffix, partial=True)


@given(glob_and_fills())
@settings(max_examples=200, deadline=None)
def test_wildcard_fill_never_crosses_separator(gf):
    """A '*' fill containing the path separator must NOT match."""
    glob_s, fills = gf
    if not fills:
        return
    g = Glob(glob_s)
    bad = list(fills)
    bad[0] = bad[0] + "/X"
    path = _fill_glob(glob_s, bad)
    assert not g.matches(path), (glob_s, path)
