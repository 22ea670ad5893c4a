"""Property-based round-trip tests (hypothesis) for the r8 codecs:
FlatGeobuf (geom/fgb.py) and baseline JPEG (llm/jpeg.py). Pure-python
— no Spark fixture."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st_

from arctic_spark.geom import fgb as FG
from arctic_spark.geom import wkb as W
from arctic_spark.llm import jpeg as J

coord = st_.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False,
                   width=64).map(lambda v: round(v, 6))


@st_.composite
def ragged_geometry(draw):
    kind = draw(st_.integers(0, 4))
    if kind == 0:                                  # point
        return (0, [draw(coord)], [draw(coord)], [1], [1])
    if kind == 1:                                  # linestring
        n = draw(st_.integers(2, 8))
        return (1, [draw(coord) for _ in range(n)],
                [draw(coord) for _ in range(n)], [n], [1])
    if kind == 2:                                  # rect polygon + hole
        x, y = draw(coord), draw(coord)
        w = draw(st_.floats(1.0, 50.0))
        h = draw(st_.floats(1.0, 50.0))
        shell_x = [x, x + w, x + w, x, x]
        shell_y = [y, y, y + h, y + h, y]
        if draw(st_.booleans()):
            hx, hy = x + w / 4, y + h / 4
            hw, hh = w / 4, h / 4
            return (3, shell_x + [hx, hx, hx + hw, hx + hw, hx],
                    shell_y + [hy, hy + hh, hy + hh, hy, hy],
                    [5, 5], [2])
        return (3, shell_x, shell_y, [5], [1])
    if kind == 3:                                  # multipoint
        n = draw(st_.integers(1, 6))
        return (4, [draw(coord) for _ in range(n)],
                [draw(coord) for _ in range(n)],
                [1] * n, [1] * n)
    n1, n2 = draw(st_.integers(2, 5)), draw(st_.integers(2, 5))
    xs = [draw(coord) for _ in range(n1 + n2)]
    ys = [draw(coord) for _ in range(n1 + n2)]
    return (5, xs, ys, [n1, n2], [1, 1])           # multilinestring


@settings(max_examples=60, deadline=None)
@given(st_.lists(ragged_geometry(), min_size=1, max_size=8),
       st_.integers(0, 1))
def test_fgb_random_geometry_roundtrip(cells, use_index):
    rows = [(c, [i]) for i, c in enumerate(cells)]
    blob = FG.write_fgb("t", [("k", FG.CT_LONG)], rows,
                        index_node_size=4 if use_index else 0)
    _, feats = FG.read_fgb(blob)
    assert len(feats) == len(cells)
    by_key = {f[1]["k"]: f[0] for f in feats}
    for i, c in enumerate(cells):
        assert by_key[i] == W.encode_geom(*c)


@settings(max_examples=40, deadline=None)
@given(st_.lists(st_.tuples(coord, coord), min_size=1, max_size=30),
       st_.tuples(coord, coord, coord, coord))
def test_fgb_bbox_query_matches_brute(pts, box):
    x0, y0, x1, y1 = box
    bbox = (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
    rows = [((0, [x], [y], [1], [1]), [i])
            for i, (x, y) in enumerate(pts)]
    blob = FG.write_fgb("p", [("k", FG.CT_LONG)], rows,
                        index_node_size=3)
    got = {f[1]["k"] for f in FG.read_fgb(blob, bbox=bbox)[1]}
    want = {i for i, (x, y) in enumerate(pts)
            if bbox[0] <= x <= bbox[2] and bbox[1] <= y <= bbox[3]}
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st_.text(min_size=0, max_size=40),
       st_.binary(min_size=0, max_size=40),
       st_.integers(-2**40, 2**40),
       st_.one_of(st_.none(), st_.booleans()))
def test_fgb_random_properties_roundtrip(s, raw, num, flag):
    cols = [("s", FG.CT_STRING), ("raw", FG.CT_BINARY),
            ("num", FG.CT_LONG), ("flag", FG.CT_BOOL)]
    blob = FG.write_fgb("p", cols, [(None, [s, raw, num, flag])])
    _, feats = FG.read_fgb(blob)
    props = feats[0][1]
    assert props["s"] == s and props["raw"] == raw
    assert props["num"] == num
    assert props.get("flag") == (flag if flag is not None else None)


@settings(max_examples=25, deadline=None)
@given(st_.integers(1, 40), st_.integers(1, 40),
       st_.integers(0, 255), st_.booleans())
def test_jpeg_smooth_image_bounded_error(h, w, base, color):
    # low-frequency content: a gentle two-axis ramp from `base`
    yy, xx = np.mgrid[0:h, 0:w]
    g = np.clip(base + xx // 4 + yy // 4, 0, 255).astype(np.uint8)
    img = np.stack([g, g, g], -1) if color else g
    dec = J.parse_jpeg(J.encode_jpeg(img, quality=92))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() < 4.0


@settings(max_examples=15, deadline=None)
@given(st_.integers(2, 33), st_.integers(2, 33), st_.integers(1, 7))
def test_jpeg_420_odd_sizes(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200)
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([np.clip(base + xx, 0, 255),
                    np.clip(base + yy, 0, 255),
                    np.full((h, w), base)], -1).astype(np.uint8)
    dec = J.parse_jpeg(J.encode_jpeg(rgb, quality=92, subsample=True))
    assert dec.shape == rgb.shape
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.mean() < 6.0
