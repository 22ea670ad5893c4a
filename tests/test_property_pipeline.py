"""Property-based tests (hypothesis) for the pipeline operators' pure
python twins — next-fit packing and chunk-cover invariants hold for ANY
input, not just the hand-picked fixtures. No Spark: the properties are
checked against the same arithmetic the Spark expressions implement,
plus one Spark cross-check on a sampled case in test_pipeline_ops."""

from hypothesis import given, settings
from hypothesis import strategies as st_


def _next_fit(tokens, budget):
    bins, cur, fill = [], 0, 0
    for t in tokens:
        if fill > 0 and fill + t > budget:
            cur += 1
            fill = 0
        fill += t
        bins.append(cur)
    return bins


@settings(max_examples=200, deadline=None)
@given(st_.lists(st_.integers(0, 500), min_size=1, max_size=60),
       st_.integers(1, 300))
def test_next_fit_invariants(tokens, budget):
    bins = _next_fit(tokens, budget)
    # bins are dense and monotone non-decreasing
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # every bin's fill <= budget unless one member is itself oversized
    # (zero-token docs may legally share a bin with it)
    fills = {}
    maxes = {}
    for b, t in zip(bins, tokens):
        fills[b] = fills.get(b, 0) + t
        maxes[b] = max(maxes.get(b, 0), t)
    for b, f in fills.items():
        assert f <= budget or (maxes[b] > budget
                               and f - maxes[b] <= budget)
    # next-fit never leaves a bin that the NEXT doc could have joined
    for i in range(1, len(bins)):
        if bins[i] != bins[i - 1]:
            prev_fill = sum(t for b, t in zip(bins[:i], tokens[:i])
                            if b == bins[i - 1])
            assert prev_fill + tokens[i] > budget


def _chunk_starts(n, chunk, stride):
    last = max((n - (chunk - stride) - 1) // stride * stride + 1, 1)
    return list(range(1, last + 1, stride))


@settings(max_examples=200, deadline=None)
@given(st_.integers(1, 200), st_.integers(2, 50), st_.integers(0, 48))
def test_chunk_cover_invariants(n, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    starts = _chunk_starts(n, chunk, overlap and chunk - stride or chunk)
    starts = _chunk_starts(n, chunk, stride)
    # chunks cover every token
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + chunk, n + 1)))
    assert covered == set(range(1, n + 1))
    # consecutive chunks overlap by exactly `overlap` (when both full)
    for a, b in zip(starts, starts[1:]):
        assert b - a == stride
    # no chunk starts past the end
    assert all(s <= n for s in starts)
    # the final chunk contributes at least one NEW token unless n < chunk
    if len(starts) > 1:
        assert starts[-1] + chunk - stride > starts[-2] + chunk - 1 or \
            starts[-1] <= n
