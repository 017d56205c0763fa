"""Unit tests for the round-3 quad/strip splitters (ocr/postprocess.py):
merged-component recovery without retraining — multi-line row bands,
horizontally merged fragments, rotated-page coordinate clustering."""

import numpy as np

from intool_rag_tpu.ocr.postprocess import (
    QuadBox,
    split_quad_fragments,
    split_quad_lines,
    split_strip_columns,
)


def _quad(x0, y0, x1, y1):
    return QuadBox(
        np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32
        ),
        1.0,
    )


def _page(h=200, w=400):
    return np.ones((h, w, 3), np.float32)


def _blob(img, x0, y0, x1, y1):
    img[y0:y1, x0:x1] = 0.0


def test_two_stacked_lines_split():
    img = _page()
    _blob(img, 20, 40, 300, 60)  # line 1
    _blob(img, 20, 72, 260, 92)  # line 2, 12px gap
    merged = _quad(15, 35, 310, 97)
    parts = split_quad_lines(img, merged)
    assert len(parts) == 2
    ys = sorted(float(p.points[:, 1].mean()) for p in parts)
    assert 40 <= ys[0] <= 65 and 66 <= ys[1] <= 97


def test_single_line_passes_through():
    img = _page()
    _blob(img, 20, 40, 300, 60)
    q = _quad(15, 35, 310, 65)
    parts = split_quad_lines(img, q)
    assert len(parts) == 1 and parts[0] is q


def test_blank_region_passes_through():
    img = _page()
    q = _quad(15, 35, 310, 97)
    assert split_quad_lines(img, q) == [q]


def test_strip_column_gap_splits():
    # strip: two ink clusters separated by a gap ≫ word space
    strip = np.ones((32, 400, 3), np.float32)
    strip[8:24, 10:120] = 0.0
    strip[8:24, 300:390] = 0.0
    q = _quad(0, 0, 400, 32)
    parts = split_strip_columns(strip, q, extend_frac=0.0)
    assert len(parts) == 2
    (c1, q1), (c2, q2) = parts
    assert c1.shape[1] < 200 and c2.shape[1] < 200
    # sub-quads sit on the reading axis in order
    assert q1.points[:, 0].mean() < q2.points[:, 0].mean()


def test_strip_word_spaces_do_not_split():
    strip = np.ones((32, 300, 3), np.float32)
    # three "words" with ~12px gaps (< 1.2·h)
    for x0 in (10, 80, 150):
        strip[8:24, x0 : x0 + 58] = 0.0
    q = _quad(0, 0, 300, 32)
    assert len(split_strip_columns(strip, q, extend_frac=0.0)) == 1


def test_rotated_fragments_split_by_angle():
    # two lines along a 15° axis: axis-aligned rows overlap, the
    # angle-aware clustering must separate them
    img = _page(300, 500)
    a = np.radians(15.0)
    u = np.array([np.cos(a), np.sin(a)])
    v = np.array([-np.sin(a), np.cos(a)])
    origin = np.array([60.0, 60.0])
    for line in range(2):
        base = origin + v * (line * 34.0)
        for t in range(0, 280, 4):
            x, y = base + u * t
            img[int(y) : int(y) + 14, int(x) : int(x) + 3] = 0.0
    ys, xs = np.nonzero(img[:, :, 0] < 0.5)
    merged = _quad(xs.min() - 2, ys.min() - 2, xs.max() + 2, ys.max() + 2)
    parts = split_quad_fragments(img, merged, 15.0, 30.0)
    assert len(parts) == 2
    # each part's reading angle tracks the true text angle
    for p in parts:
        ang = p.angle % 180.0
        assert min(ang, 180 - ang) < 25.0


def test_fragment_angle_refit_when_no_split():
    # ONE 15° line whose quad came in axis-aligned (wrong axis): the
    # splitter finds nothing to cut but re-fits the box at the page
    # angle
    img = _page(300, 500)
    a = np.radians(15.0)
    u = np.array([np.cos(a), np.sin(a)])
    origin = np.array([60.0, 60.0])
    for t in range(0, 280, 4):
        x, y = origin + u * t
        img[int(y) : int(y) + 14, int(x) : int(x) + 3] = 0.0
    ys, xs = np.nonzero(img[:, :, 0] < 0.5)
    wrong = _quad(xs.min(), ys.min(), xs.max(), ys.max())  # angle 0
    parts = split_quad_fragments(img, wrong, 15.0, 30.0)
    assert len(parts) == 1
    ang = parts[0].angle % 180.0
    assert 10.0 <= min(ang, 180.0 - ang) <= 20.0
