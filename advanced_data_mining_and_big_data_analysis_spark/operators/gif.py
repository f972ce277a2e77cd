"""GIF87a codec — from-scratch encoder + decoder against the public
GIF87a specification (CompuServe, 1987; also ITU-T T.84 Annex),
completing the codec family next to WAV/BMP/PNG (operators/
multimodal.py) and JPEG (operators/jpeg.py).

Scope: single-image GIF87a, global color table only, no interlace, no
extensions — the container features the format guarantees; everything
here is spec-driven:

- logical screen descriptor + global color table parsing/writing;
- the GIF flavor of LZW: variable code width starting at
  min_code_size+1, LSB-first bit packing, CLEAR and EOI codes,
  dictionary growth to 12 bits with CLEAR-reset, and the
  "code-not-yet-in-table" (cScSc) decode case;
- 255-byte sub-block framing.

The encoder emits a genuinely compressed stream (growing dictionary),
not the degenerate emit-clear-per-symbol shortcut, so the decoder's
dictionary handling is actually exercised; a round-trip property test
plus the a0194 oracle (features recomputed from the generating
formula) pin both directions.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer (GIF packs code words little-endian)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    """LSB-first bit unpacker."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: CLEAR, greedy longest-match with a growing
    dictionary (up to 12-bit codes, CLEAR-reset at the cap), EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    bw = _BitWriter()
    bw.write(clear, width)
    cur = b""
    for b in indices:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        bw.write(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # width bumps AFTER emitting a code once next_code exceeds the
        # current width's range; at 4096 the encoder must CLEAR-reset
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code > 4096 - 1 and width == 12:
            bw.write(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        bw.write(table[cur], width)
        # phantom add: the decoder appends one table entry per data code
        # (it cannot know this was the last), so its width counter runs
        # one ahead of the encoder's real table here. Advance the
        # counter WITHOUT storing an entry so the EOI width matches the
        # decoder's expectation when the flush lands exactly on a
        # power-of-two boundary (hypothesis-found off-by-one).
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
    bw.write(eoi, width)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of lzw_encode, incl. the cScSc not-yet-in-table case."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # cScSc
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1


# ---------------------------------------------------------------------------
# GIF87a container
# ---------------------------------------------------------------------------


def make_gif(
    width: int, height: int, palette: list[tuple[int, int, int]], index_fn
) -> bytes:
    """Single-image GIF87a with a global color table. `palette` length
    must be a power of two in [2, 256]; index_fn(x, y) -> palette idx."""
    n = len(palette)
    assert n >= 2 and (n & (n - 1)) == 0, "palette size must be a power of two"
    ct_bits = max(1, (n - 1).bit_length())
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | ((ct_bits - 1) & 7))  # GCT flag + size
    out += b"\x00\x00"  # bg index, aspect
    for r, g, b in palette:
        out += bytes([r, g, b])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    min_code = max(2, ct_bits)
    out.append(min_code)
    idx = bytes(index_fn(x, y) for y in range(height) for x in range(width))
    comp = lzw_encode(idx, min_code)
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(content: bytes) -> list[float]:
    """[width, height, avg_r, avg_g, avg_b, topleft_palette_index]."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", content, 6)
    packed = content[10]
    if not packed & 0x80:
        raise ValueError("no global color table")
    n = 2 << (packed & 7)
    pos = 13
    palette = [tuple(content[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
    pos += 3 * n
    while content[pos] != 0x2C:  # skip extensions (GIF89a inputs)
        if content[pos] == 0x21:
            pos += 2
            while content[pos]:
                pos += 1 + content[pos]
            pos += 1
        else:
            raise ValueError(f"unexpected block 0x{content[pos]:02x}")
    _, _, iw, ih = struct.unpack_from("<HHHH", content, pos + 1)
    ipacked = content[pos + 9]
    if ipacked & 0xC0:
        raise ValueError("local color table / interlace not supported")
    pos += 10
    min_code = content[pos]
    pos += 1
    comp = bytearray()
    while content[pos]:
        ln = content[pos]
        comp += content[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    indices = lzw_decode(bytes(comp), min_code)
    if len(indices) != iw * ih:
        raise ValueError(f"decoded {len(indices)} pixels for {iw}x{ih}")
    tr = tg = tb = 0
    for i in indices:
        r, g, b = palette[i]
        tr += r
        tg += g
        tb += b
    npx = iw * ih
    return [
        float(iw),
        float(ih),
        tr / npx,
        tg / npx,
        tb / npx,
        float(indices[0]),
    ]
