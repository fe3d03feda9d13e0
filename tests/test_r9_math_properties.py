"""Property-based armor for the round-9 kernels: the bounded-state
sorted-arrival SNM kernel (twin #34) fuzzed against the whole-block
kernel over EVERY possible batch split, and q212's non-negative-shift
floor-mean identity fuzzed over negative sums."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# twin #34: any in-order batch split of a sorted block emits the same
# pair SET as the whole-block kernel, with state never exceeding w
# ---------------------------------------------------------------------------

_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),  # n_chars
        st.text(alphabet="ab", max_size=2),                           # title
    ),
    min_size=0,
    max_size=10,
)


@settings(max_examples=150, deadline=None)
@given(_rows, st.lists(st.integers(min_value=1, max_value=4), max_size=4),
       st.integers(min_value=1, max_value=4))
def test_sorted_kernel_pairs_equal_whole_block_under_any_split(
    rows, cut_sizes, window
):
    import pandas as pd

    from polla_spark.functions.linkage import (
        make_snm_pair_kernel,
        make_snm_sorted_kernel,
    )

    class _St:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

    cols = ["doc_id", "n_chars", "title"]
    block = [(i, nc, t) for i, (nc, t) in enumerate(rows)]

    def pdf(chunk):
        return pd.DataFrame(chunk, columns=cols, dtype=object)

    want = sorted(
        tuple(r)
        for r in next(
            make_snm_pair_kernel(window=window)(("en",), iter([pdf(block)]), _St())
        ).itertuples(index=False)
    )

    # split the SORTED order into consecutive chunks per cut_sizes
    # (remainder = final chunk); feeding sorted chunks in order is
    # exactly the kernel's contract
    srt = sorted(block, key=lambda r: (r[1] is not None, r[1] or 0, r[0]))
    chunks, i = [], 0
    for c in cut_sizes:
        if i >= len(srt):
            break
        chunks.append(srt[i:i + c])
        i += c
    if i < len(srt):
        chunks.append(srt[i:])
    fn = make_snm_sorted_kernel(window=window)
    st_ = _St()
    got = []
    for ch in chunks:
        out = next(fn(("en",), iter([pdf(ch)]), st_))
        got.extend(tuple(r) for r in out.itertuples(index=False))
        assert len(st_.get[1]) <= window
    assert sorted(got) == want


# ---------------------------------------------------------------------------
# q212: the non-negative-shift floor mean equals math.floor(s / n)
# for ANY integer sum (including negative) — the identity that lets
# Spark div, DuckDB // (both truncating) and Python // (flooring)
# produce the same centroid
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=10_000).flatmap(
        lambda n: st.tuples(
            # s is a sum of n int8 codes, so |s| <= 127*n by domain
            st.integers(min_value=-127 * n, max_value=127 * n),
            st.just(n),
        )
    )
)
def test_shifted_floor_mean_identity(sn):
    s, n = sn
    import math

    # the shift guarantees a non-negative numerator (each of the n
    # summands is >= -127), where flooring and truncating division
    # coincide — so Spark div / DuckDB // (truncate) and Python //
    # (floor) all produce the same quotient q
    m = s + 127 * n
    assert m >= 0
    q = m // n
    assert q * n <= m < (q + 1) * n          # q IS floor(m / n)
    assert q == math.floor(m / n) >= 0       # trunc(m/n) == floor(m/n) at m >= 0
    # and the shifted mean is exactly the true floor mean of s/n
    assert q - 127 == (s - (s % n)) // n == math.floor(s / n) if n else True
