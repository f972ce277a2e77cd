"""Round-11 operator tests: lossless JPEG (T.81 Annex H) codec
properties and targeted unit checks for the new wave's primitives.

The Spark-side queries themselves are pinned by the registry-wide
oracle sweep (tests/test_declared_queries.py hash-matches every
query against DuckDB at sf0.001); these tests cover the pure-python
codec paths and invariants the oracle construction RELIES on.
"""

from __future__ import annotations

import numpy as np
import pytest

from advanced_data_mining_and_big_data_analysis_spark.operators import jpeg


@pytest.mark.parametrize("pred", range(1, 8))
def test_lossless_jpeg_roundtrip_all_predictors(pred: int) -> None:
    """Every Annex-H predictor round-trips a gradient image bit-exactly
    (lossless mode's defining contract)."""
    blob = jpeg.make_jpeg_lossless(
        16, 16, lambda x, y: (7 + 5 * x + 3 * y) % 256, predictor=pred
    )
    w, h, planes = jpeg._parse(blob)
    assert (w, h) == (16, 16)
    want = np.array([[(7 + 5 * x + 3 * y) % 256 for x in range(16)] for y in range(16)])
    assert (planes[0].astype(np.int64) == want).all()


def test_lossless_jpeg_roundtrip_random_images() -> None:
    """hypothesis: ANY 8-bit image survives the SOF3 encode/decode
    bit-exactly for every predictor — including odd (non-multiple-of-8)
    dimensions, hard transitions, and constant rows that stress the
    H.1.1 boundary rules (first sample 2^(P-1), first line -> A,
    first column -> B)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=7),
        st.lists(st.integers(min_value=0, max_value=255), min_size=144, max_size=144),
    )
    def check(w: int, h: int, pred: int, vals: list[int]) -> None:
        img = np.array(vals[: w * h]).reshape(h, w) if w * h <= 144 else None
        blob = jpeg.make_jpeg_lossless(
            w, h, lambda x, y: int(img[y, x]), predictor=pred
        )
        dw, dh, planes = jpeg._parse(blob)
        assert (dw, dh) == (w, h)
        assert (planes[0].astype(np.int64) == img).all()

    check()


def test_lossless_jpeg_extreme_diffs() -> None:
    """Alternating 0/255 columns produce the +/-255 max-magnitude diffs
    (SSSS category 8) — the widest codes the K.3 DC table must carry."""
    blob = jpeg.make_jpeg_lossless(
        8, 4, lambda x, y: 255 if x % 2 else 0, predictor=1
    )
    _, _, planes = jpeg._parse(blob)
    want = np.array([[255 if x % 2 else 0 for x in range(8)] for _ in range(4)])
    assert (planes[0].astype(np.int64) == want).all()


def test_lossless_predictor_boundary_rules() -> None:
    """The decoder applies H.1.1 regardless of the scan's selector:
    a constant image encodes to all-zero diffs only if the boundary
    rules match the encoder's — a predictor leak at (0,0), the first
    line, or the first column would break the constant plane."""
    for pred in range(1, 8):
        blob = jpeg.make_jpeg_lossless(9, 9, lambda x, y: 128, predictor=pred)
        _, _, planes = jpeg._parse(blob)
        assert (planes[0] == 128).all()
    # 128 at (0,0) is the 2^(P-1) special case: zero diff; any other
    # constant exercises a nonzero first diff
    blob = jpeg.make_jpeg_lossless(5, 5, lambda x, y: 37, predictor=4)
    _, _, planes = jpeg._parse(blob)
    assert (planes[0] == 37).all()


@pytest.mark.parametrize("pred", range(1, 8))
def test_lossless12_jpeg_roundtrip(pred: int) -> None:
    """12-bit precision: gradient + extreme 0/4095 checkerboard (forces
    mod-65536 overshoot diffs and the widest SSSS categories)."""
    blob = jpeg.make_jpeg_lossless(
        16, 16, lambda x, y: (37 * x + 113 * y + 2048) % 4096,
        predictor=pred, precision=12,
    )
    _, _, planes = jpeg._parse(blob)
    want = np.array(
        [[(37 * x + 113 * y + 2048) % 4096 for x in range(16)] for y in range(16)]
    )
    assert (planes[0].astype(np.int64) == want).all()
    blob = jpeg.make_jpeg_lossless(
        9, 7, lambda x, y: 4095 * ((x + y) % 2), predictor=pred, precision=12
    )
    _, _, planes = jpeg._parse(blob)
    want = np.array([[4095 * ((x + y) % 2) for x in range(9)] for y in range(7)])
    assert (planes[0].astype(np.int64) == want).all()


def test_lossless12_random_roundtrip() -> None:
    """hypothesis: arbitrary 12-bit images round-trip for every
    predictor (mod-65536 difference coding is the invariant)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=7),
        st.lists(st.integers(min_value=0, max_value=4095), min_size=81, max_size=81),
    )
    def check(w: int, h: int, pred: int, vals: list[int]) -> None:
        img = np.array(vals[: w * h]).reshape(h, w)
        blob = jpeg.make_jpeg_lossless(
            w, h, lambda x, y: int(img[y, x]), predictor=pred, precision=12
        )
        _, _, planes = jpeg._parse(blob)
        assert (planes[0].astype(np.int64) == img).all()

    check()


def test_lossless_jpeg_missing_dc_table_is_valueerror() -> None:
    """An SOS whose Td names a table defined only as AC class must fail
    with the module's ValueError convention, not a KeyError — and an AC
    table sharing the same Th must NOT satisfy the DC lookup
    (T.81 B.2.4.2 keys tables by (class, id))."""
    blob = bytearray(
        jpeg.make_jpeg_lossless(8, 8, lambda x, y: (x + y) % 256, predictor=1)
    )
    dht = blob.find(b"\xff\xc4")
    assert dht >= 0
    tc_th = dht + 4  # marker(2) + length(2) -> Tc/Th byte
    assert blob[tc_th] >> 4 == 0  # encoder writes a DC-class table
    blob[tc_th] |= 0x10  # reclassify as AC, same id
    with pytest.raises(ValueError, match="missing DC Huffman table"):
        jpeg._parse(bytes(blob))
