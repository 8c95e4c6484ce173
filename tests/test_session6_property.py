"""Hypothesis property tests for the session-6 primitives — laws on
ARBITRARY inputs the parquet fixtures cannot explore (adversarial
chains, gappy series, skewed partitions). Pure Python, no Spark
session: fast enough for wide example counts.
"""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from c99_vectordb_spark.queries_ext import _markov_fixed_point
from c99_vectordb_spark.streaming.stateful import cusum_replay_py

# ---------------------------------------------------------------------------
# Markov fixed point
# ---------------------------------------------------------------------------

_CHANNELS = ("a", "b", "c")
_DSTS = _CHANNELS + ("conv", "null")


@st.composite
def _chains(draw):
    counts = {}
    for src in ("start",) + _CHANNELS:
        n_out = draw(st.integers(min_value=1, max_value=len(_DSTS)))
        dsts = draw(
            st.lists(
                st.sampled_from(_DSTS), min_size=n_out, max_size=n_out, unique=True
            )
        )
        for d in dsts:
            counts[(src, d)] = draw(st.integers(min_value=1, max_value=50))
    return counts


@settings(max_examples=150, deadline=None)
@given(_chains())
def test_markov_p_bounded_and_knockout_monotone(counts):
    p = _markov_fixed_point(counts, removed=None)
    assert 0 <= p <= 1_000_000
    for ch in _CHANNELS:
        pr = _markov_fixed_point(counts, removed=ch)
        # knocking a channel out reroutes its inbound flow to 'null':
        # conversion probability can only fall (up to the shared ppm
        # truncation floor, which both twins replay identically)
        assert 0 <= pr <= p + 1  # +1: per-round floor-div slack cannot
        #                          exceed one ppm unit after 8 rounds
        #                          of identical truncation — observed 0
        #                          in 150x3 cases; the bound documents
        #                          the only legal source of inversion


@settings(max_examples=100, deadline=None)
@given(_chains(), st.integers(min_value=1, max_value=50))
def test_markov_direct_conversion_boost_monotone(counts, boost):
    """Adding direct start->conv mass never lowers conversion."""
    p0 = _markov_fixed_point(counts, removed=None)
    boosted = dict(counts)
    boosted[("start", "conv")] = boosted.get(("start", "conv"), 0) + boost
    assert _markov_fixed_point(boosted, removed=None) >= p0 - 1


# ---------------------------------------------------------------------------
# CUSUM closed form == recursion on arbitrary gappy series
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=1, max_value=20),
        max_size=25,
    ),
    st.integers(min_value=0, max_value=5),
)
def test_cusum_closed_form_equals_recursion(counts, ref):
    """The prefix-sum closed form (what the Spark windows compute)
    equals Page's recursion (cusum_replay_py) on any series with any
    gap pattern — the identity q_events_cusum_shift rests on."""
    h0, h1 = 0, 60
    dense = [counts.get(h, 0) for h in range(h0, h1 + 1)]
    # closed form: S_t = P_t - min(0, min_{j<=t} P_j); mirrored down
    p = 0
    rmin = rmax = 0
    max_up = max_dn = 0
    peak = h0
    for i, y in enumerate(dense):
        p += y - ref
        rmin = min(rmin, p)
        rmax = max(rmax, p)
        s_up = p - min(rmin, 0)
        s_dn = max(rmax, 0) - p
        if s_up > max_up:
            max_up, peak = s_up, h0 + i
        max_dn = max(max_dn, s_dn)
    up, dn, pk = cusum_replay_py(counts, ref, h0, h1)
    assert (up, dn) == (max_up, max_dn)
    if up > 0:
        assert pk == peak


# ---------------------------------------------------------------------------
# OHLC mergeable-candlestick algebra: partition independence
# ---------------------------------------------------------------------------

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1_000),  # ts
        st.integers(min_value=0, max_value=10_000),  # id
        st.integers(min_value=-500, max_value=500),  # cents
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda e: (e[0], e[1]),
)


def _fold_bar(state, events):
    for ts, eid, v in events:
        if state is None:
            state = [ts, eid, v, ts, eid, v, v, v, 1, v]
            continue
        (o_ts, o_id, o_v, c_ts, c_id, c_v, hi, lo, vol, s) = state
        if (ts, eid) < (o_ts, o_id):
            o_ts, o_id, o_v = ts, eid, v
        if (ts, eid) > (c_ts, c_id):
            c_ts, c_id, c_v = ts, eid, v
        state = [
            o_ts, o_id, o_v, c_ts, c_id, c_v,
            max(hi, v), min(lo, v), vol + 1, s + v,
        ]
    return state


@settings(max_examples=200, deadline=None)
@given(_EVENTS, st.integers(min_value=0, max_value=40))
def test_ohlc_state_is_partition_independent(events, cut):
    """Folding the events in ANY two-batch split (including shuffled
    within batches) yields the same bar as one ordered pass — the
    mergeability streaming_ohlc_bars relies on."""
    cut = min(cut, len(events))
    one = _fold_bar(None, sorted(events))
    a, b = events[:cut], events[cut:]
    two = _fold_bar(_fold_bar(None, a), b)
    rev = _fold_bar(_fold_bar(None, list(reversed(b))), list(reversed(a)))
    assert one == two == rev
