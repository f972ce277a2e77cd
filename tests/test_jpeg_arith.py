"""Arithmetic-coded JPEG (T.81 Annex D/F) — codec-level pins.

The oracle hash (a0021) checks decoded statistics of exact-surviving
fixtures; these pin the coder itself: QM-coder round-trips across
probability skews, the cross-entropy-coder identity (arithmetic decode
== Huffman decode of the SAME image — two independent coders over
identical quantized coefficients), the compression direction, byte
stuffing, and the poisoned-blob raise policy.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from advanced_data_mining_and_big_data_analysis_spark.operators import jpeg as J
from advanced_data_mining_and_big_data_analysis_spark.operators import jpeg_arith as JA


def test_qm_coder_roundtrip_across_skews():
    rng = random.Random(42)
    for p1 in (0.5, 0.9, 0.1, 0.99, 0.999, 0.01):
        bits = [1 if rng.random() < p1 else 0 for _ in range(5000)]
        enc = JA._ArithEncoder()
        st = [0, 0]
        for b in bits:
            enc.encode(st, b)
        dec = JA._ArithDecoder(enc.flush())
        st2 = [0, 0]
        assert [dec.decode(st2) for _ in bits] == bits, f"p={p1}"


def test_qm_coder_multi_context_and_fixed_state():
    rng = random.Random(7)
    enc = JA._ArithEncoder()
    sts = [[0, 0] for _ in range(5)] + [[JA._FIXED, 0]]
    seq = [(rng.randint(0, 5), rng.randint(0, 1)) for _ in range(3000)]
    for i, b in seq:
        enc.encode(sts[i], b)
    # the fixed state never adapts
    assert sts[5] == [JA._FIXED, 0]
    dec = JA._ArithDecoder(enc.flush())
    sts2 = [[0, 0] for _ in range(5)] + [[JA._FIXED, 0]]
    assert [dec.decode(sts2[i]) for i, _ in seq] == [b for _, b in seq]


def test_qm_compression_tracks_skew():
    """A 99%-skewed source must compress far below 1 bit/bit; a fair
    source must not (sanity on the Table D.3 estimation machine)."""
    rng = random.Random(3)
    sizes = {}
    for p1 in (0.5, 0.99):
        bits = [1 if rng.random() < p1 else 0 for _ in range(8000)]
        enc = JA._ArithEncoder()
        st = [0, 0]
        for b in bits:
            enc.encode(st, b)
        sizes[p1] = len(enc.flush()) * 8
    assert sizes[0.99] < 0.2 * 8000
    assert sizes[0.5] > 0.9 * 8000


def _gray_const(x: int, y: int) -> int:
    return 128 + 2 * ((((x // 8) * 3 + (y // 8) * 5) % 50) - 25)


def test_constant_blocks_survive_exactly_gray():
    blob = JA.make_jpeg_arith_gray(16, 16, _gray_const)
    w, h, planes = JA._parse_arith(blob)
    ref = np.array([[_gray_const(x, y) for x in range(16)] for y in range(16)], dtype=float)
    assert (w, h) == (16, 16)
    assert np.array_equal(planes[0], ref)


def test_constant_blocks_survive_exactly_color():
    def pixc(x, y):
        return (
            128 + 2 * ((((x // 8) * 3 + (y // 8) * 5) % 50) - 25),
            128 + 17 * ((((x // 8) + (y // 8)) % 3) - 1),
            128 + 17 * (((2 * (x // 8) + (y // 8)) % 3) - 1),
        )

    blob = JA.make_jpeg_arith_color(16, 16, pixc)
    w, h, planes = JA._parse_arith(blob)
    for i in range(3):
        ref = np.array([[pixc(x, y)[i] for x in range(16)] for y in range(16)], dtype=float)
        assert np.array_equal(planes[i], ref), f"component {i}"


def test_arith_equals_huffman_decode():
    """The decisive cross-check: the SAME image through the Huffman
    baseline codec and the arithmetic codec decodes IDENTICALLY (both
    entropy-code the same quantized coefficients losslessly), and the
    arithmetic stream is smaller — the known arithmetic-coding gain."""

    def pix(x, y):
        return (x * 31 + y * 17 + ((x * y) % 97) * 2) % 256

    bh = J.make_jpeg_gray(40, 40, pix)
    ba = JA.make_jpeg_arith_gray(40, 40, pix)
    _, _, ph = J._parse(bh)
    _, _, pa = JA._parse_arith(ba)
    assert np.allclose(ph[0], pa[0])
    assert len(ba) < len(bh)


def test_high_magnitude_shared_bins_roundtrip():
    """A hard checkerboard drives large AC magnitudes through the
    shared 189/217 high-magnitude trees (and both Kx sides)."""

    def pix(x, y):
        return 255 if (x + y) % 2 == 0 else 0

    bh = J.make_jpeg_gray(24, 24, pix)
    ba = JA.make_jpeg_arith_gray(24, 24, pix)
    _, _, ph = J._parse(bh)
    _, _, pa = JA._parse_arith(ba)
    assert np.allclose(ph[0], pa[0])


def test_entropy_segment_ff_bytes_are_stuffed():
    """Inside the entropy segment every 0xFF must be followed by 0x00
    (B.1.1.5) — otherwise a decoder would see a phantom marker."""

    def pix(x, y):
        return (x * 7 + y * 13 + (x * y) % 31) % 256

    blob = JA.make_jpeg_arith_gray(48, 48, pix)
    sos = blob.find(b"\xff\xda")
    assert sos > 0
    import struct

    (ln,) = struct.unpack_from(">H", blob, sos + 2)
    data = blob[sos + 2 + ln : len(blob) - 2]  # up to EOI
    i = 0
    while i < len(data):
        if data[i] == 0xFF:
            assert i + 1 < len(data) and data[i + 1] == 0x00, f"bare 0xFF at {i}"
            i += 2
        else:
            i += 1


def test_decode_dispatch_and_poison_policy():
    blob = JA.make_jpeg_arith_gray(16, 16, _gray_const)
    feats = J.decode_jpeg(blob)  # jpeg._parse dispatches on SOF9
    assert feats[0] == 16 and feats[1] == 16
    # DRI in an arithmetic stream raises (unsupported by design)
    import struct

    dri = struct.pack(">HHH", 0xFFDD, 4, 2)
    poisoned = blob[:2] + dri + blob[2:]
    with pytest.raises(ValueError):
        JA._parse_arith(poisoned)
    # truncating the frame header raises
    with pytest.raises(ValueError):
        JA._parse_arith(blob[:20])


def test_dac_conditioning_parsed():
    """The emitted DAC segment must carry the defaults the decoder
    reads back (L=0, U=1, Kx=5) — a conditioning mismatch would skew
    every DC context classification."""
    blob = JA.make_jpeg_arith_gray(16, 16, _gray_const)
    i = blob.find(b"\xff\xcc")
    assert i > 0
    payload = blob[i + 4 : i + 8]
    assert payload[0] == 0x00 and payload[1] == (JA._DC_U << 4) | JA._DC_L
    assert payload[2] == 0x10 and payload[3] == JA._AC_KX
