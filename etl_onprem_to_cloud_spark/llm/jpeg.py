"""Baseline-JPEG codec, stdlib + numpy only -- the fourth real
in-container image codec (VERDICT r5 item 7; after PPM/PGM, PNG).

No codec library exists in the container, so both halves are built
from the public spec (ITU-T T.81 / ISO 10918-1):

- ``jpeg_decoder`` -- a GENERAL baseline sequential-DCT decoder:
  marker walk (APPn/COM skip, DQT 8/16-bit, multiple DHT, DRI +
  restart markers), canonical Huffman decode with 0xFF00 byte
  unstuffing, DC prediction + AC run-length/EOB/ZRL, dezigzag,
  dequantize, separable float IDCT (numpy), level shift + clamp;
  grayscale (1 component) or YCbCr (3 components) with arbitrary
  per-component sampling factors (chroma replicated up, the JFIF
  default) and the standard JFIF YCbCr->RGB matrix.  Progressive
  (SOF2), extended (SOF1+), arithmetic coding, and 12-bit precision
  are rejected with a clear ValueError -- baseline only, like the
  PNG leg rejects 16-bit depth.

- ``jpeg_encode`` -- a real encoder used to BUILD fixtures from table
  data: float FDCT, quantization, standard Annex K Huffman tables,
  4:4:4 or 4:2:0 sampling.  JPEG is lossy in general, so the oracle
  trick used by the lossless legs (recompute decoded values from the
  text column in SQL) needs a fixture the transform provably
  round-trips EXACTLY: constant 8x8 blocks.  For a constant block
  every AC coefficient is mathematically zero (the FDCT basis rows
  sum to zero; float noise ~1e-13 quantizes to 0) and the DC
  coefficient is 8*(v-128), so with the DC quant step 8 used by
  ``QUANT_EXACT`` the quantized DC is the integer v-128 --
  dequantize + IDCT + level shift reproduce v bit-for-bit.  The
  fixture is lossy-format, losslessly-round-tripped by construction,
  and the decoder still exercises its full general path on it.

The decoder's numeric choices are pinned for cross-run determinism:
float64 IDCT with a precomputed basis matrix, llround-style
half-away-from-zero only via numpy's rint at the final pixel (ties
cannot occur for the exact fixtures; general content is decoder-
defined by the spec within +-1, as for every baseline decoder).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Shared tables
# --------------------------------------------------------------------------

# Zigzag order: ZIGZAG[k] = raster index (row*8+col) of the k-th
# zigzag-scanned coefficient (T.81 figure 5).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Standard Huffman tables, T.81 Annex K.3 (public spec constants).
_DC_LUM_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_SYMBOLS = list(range(12))
_DC_CHR_COUNTS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_SYMBOLS = list(range(12))
_AC_LUM_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHR_COUNTS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_SYMBOLS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Quant table (zigzag order) for exact constant-block round-trips:
# DC step 8 makes the quantized DC of a constant block the exact
# integer v-128; AC steps are irrelevant for constant blocks (the
# coefficients are zero) and set to 16 for plausible general use.
QUANT_EXACT = [8] + [16] * 63

# Separable DCT basis: _BASIS[u, x] = 0.5 * C(u) * cos((2x+1)u*pi/16),
# so F = B @ f @ B.T and f = B.T @ F @ B (orthonormal).
_BASIS = np.array(
    [
        [
            0.5
            * (1.0 / np.sqrt(2.0) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


def _canonical_codes(counts: list[int], symbols: list[int]):
    """(symbol -> (code, length)) for a canonical JPEG Huffman table
    (T.81 Annex C code assignment)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(value: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC value
    (T.81 F.1.2.1.1: negative values store value + 2^size - 1)."""
    if value == 0:
        return 0, 0
    size = int(abs(value)).bit_length()
    bits = value if value >= 0 else value + (1 << size) - 1
    return size, bits


def _encode_block(
    block: np.ndarray,
    quant: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
    writer: _BitWriter,
) -> int:
    coeffs = _BASIS @ (block.astype(np.float64) - 128.0) @ _BASIS.T
    q = np.rint(coeffs.reshape(64)[ZIGZAG] / quant).astype(np.int64)
    dc = int(q[0])
    size, bits = _magnitude(dc - pred)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def _blocks_of(plane: np.ndarray) -> "list[np.ndarray]":
    """Row-major 8x8 blocks of a plane padded to 8-multiples by edge
    replication (the spec's recommended extension)."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return [
        padded[y : y + 8, x : x + 8]
        for y in range(0, ph, 8)
        for x in range(0, pw, 8)
    ]


def jpeg_encode(
    width: int,
    height: int,
    raster: bytes,
    color: bool = False,
    subsample: bool = False,
    quant: "list[int] | None" = None,
) -> bytes:
    """Minimal, spec-correct baseline JFIF writer.

    ``raster``: row-major bytes, 1/pixel grayscale or 3/pixel RGB
    (``color=True``).  ``subsample=True`` emits 4:2:0 (2x2 luma
    sampling, chroma from exact 2x2 means); default is 4:4:4.
    ``quant`` is a 64-entry zigzag-order table for ALL components
    (default :data:`QUANT_EXACT`).
    """
    q = np.array(quant or QUANT_EXACT, dtype=np.int64)
    if q.shape != (64,) or np.any(q < 1) or np.any(q > 255):
        raise ValueError("quant must be 64 entries in 1..255")
    bpp = 3 if color else 1
    if len(raster) != width * height * bpp:
        raise ValueError("raster length does not match dimensions")
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, bpp)

    if color:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(
            np.rint(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0), 0, 255
        )
        cr = np.clip(
            np.rint(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0), 0, 255
        )
        planes = [y, cb, cr]
    else:
        planes = [arr[:, :, 0].astype(np.float64)]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _marker(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _marker(0xDB, bytes([0]) + bytes(int(v) for v in q))

    luma_hv = (2, 2) if (color and subsample) else (1, 1)
    comp_specs = [(1, *luma_hv, 0)]
    if color:
        comp_specs += [(2, 1, 1, 0), (3, 1, 1, 0)]
    sof = struct.pack(">BHHB", 8, height, width, len(comp_specs))
    for cid, h_i, v_i, tq in comp_specs:
        sof += bytes([cid, (h_i << 4) | v_i, tq])
    out += _marker(0xC0, sof)

    tables = [(0x00, _DC_LUM_COUNTS, _DC_LUM_SYMBOLS),
              (0x10, _AC_LUM_COUNTS, _AC_LUM_SYMBOLS)]
    if color:
        tables += [(0x01, _DC_CHR_COUNTS, _DC_CHR_SYMBOLS),
                   (0x11, _AC_CHR_COUNTS, _AC_CHR_SYMBOLS)]
    dht = b"".join(
        bytes([tc_th]) + bytes(counts) + bytes(symbols)
        for tc_th, counts, symbols in tables
    )
    out += _marker(0xC4, dht)

    sos = bytes([len(comp_specs)])
    for i, (cid, *_rest) in enumerate(comp_specs):
        sos += bytes([cid, 0x00 if i == 0 else (0x11 if color else 0x00)])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    dc_lum = _canonical_codes(_DC_LUM_COUNTS, _DC_LUM_SYMBOLS)
    ac_lum = _canonical_codes(_AC_LUM_COUNTS, _AC_LUM_SYMBOLS)
    dc_chr = _canonical_codes(_DC_CHR_COUNTS, _DC_CHR_SYMBOLS)
    ac_chr = _canonical_codes(_AC_CHR_COUNTS, _AC_CHR_SYMBOLS)

    writer = _BitWriter()
    if not color or not subsample:
        # 4:4:4 / grayscale: MCU = one block per component, interleaved
        # (non-interleaved when single-component).
        comp_blocks = [_blocks_of(p) for p in planes]
        preds = [0] * len(planes)
        for m in range(len(comp_blocks[0])):
            for ci, blocks in enumerate(comp_blocks):
                dc_c, ac_c = (dc_lum, ac_lum) if ci == 0 else (dc_chr, ac_chr)
                preds[ci] = _encode_block(
                    blocks[m], q, dc_c, ac_c, preds[ci], writer
                )
    else:
        # 4:2:0: MCU = 4 luma blocks (2x2) + 1 Cb + 1 Cr from exact
        # 2x2 means.
        y_p, cb_p, cr_p = planes
        h, w = y_p.shape
        ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
        y_p = np.pad(y_p, ((0, ph - h), (0, pw - w)), mode="edge")
        cb_p = np.pad(cb_p, ((0, ph - h), (0, pw - w)), mode="edge")
        cr_p = np.pad(cr_p, ((0, ph - h), (0, pw - w)), mode="edge")
        cb_d = np.rint(
            cb_p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        )
        cr_d = np.rint(
            cr_p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        )
        preds = [0, 0, 0]
        for my in range(0, ph, 16):
            for mx in range(0, pw, 16):
                for by in (0, 8):
                    for bx in (0, 8):
                        preds[0] = _encode_block(
                            y_p[my + by : my + by + 8, mx + bx : mx + bx + 8],
                            q, dc_lum, ac_lum, preds[0], writer,
                        )
                preds[1] = _encode_block(
                    cb_d[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8],
                    q, dc_chr, ac_chr, preds[1], writer,
                )
                preds[2] = _encode_block(
                    cr_d[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8],
                    q, dc_chr, ac_chr, preds[2], writer,
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RST markers
    are consumed by the caller via ``restart()``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        byte = self.data[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("restart marker inside entropy read")
            else:
                # A real marker: the segment is over but a code asked
                # for more bits -- corrupt stream.
                raise ValueError("marker inside entropy-coded segment")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._nbits += 8

    def bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, n: int) -> None:
        """Consume padding + the n-th RST marker (T.81 F.2.1.3.1)."""
        self._acc = 0
        self._nbits = 0
        while self.pos + 1 < len(self.data) and not (
            self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00
        ):
            self.pos += 1
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos + 1] != 0xD0 + (n % 8)
        ):
            raise ValueError("missing or out-of-order restart marker")
        self.pos += 2


def _decode_huffman(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | reader.bit()
        length += 1
        if length > 16:
            raise ValueError("invalid Huffman code (no match in 16 bits)")
        sym = table.get((code, length))
        if sym is not None:
            return sym


def _extend(value: int, size: int) -> int:
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def jpeg_raster(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JFIF/JPEG payload -> (width, height,
    components, row-major raster bytes) -- grayscale 1 byte/px or RGB
    3 bytes/px.  Raises ValueError on any malformed, truncated, or
    non-baseline payload (progressive, arithmetic, 12-bit, >3
    components)."""
    data = bytes(payload or b"")
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (bad SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated marker segment")
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes -- skip to the last 0xFF before the tag.
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            raise ValueError("truncated marker segment")
        tag = data[pos + 1]
        if tag == 0xD9:
            raise ValueError("EOI before SOS")
        if tag == 0x01 or 0xD0 <= tag <= 0xD7:
            # TEM / stray RSTn: standalone markers with no length field
            # (T.81 B.1.1.3); legal, carry nothing, skip.
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated marker segment")
        (size,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + size]
        if len(body) != size - 2:
            raise ValueError("truncated marker segment")
        pos += 2 + size
        if tag == 0xDB:  # DQT
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0x0F
                if pq == 0:
                    if len(b) < 65:
                        raise ValueError("truncated DQT")
                    quant[tq] = np.frombuffer(
                        b[1:65], dtype=np.uint8
                    ).astype(np.int64)
                    b = b[65:]
                elif pq == 1:
                    if len(b) < 129:
                        raise ValueError("truncated DQT")
                    quant[tq] = np.frombuffer(
                        b[1:129], dtype=">u2"
                    ).astype(np.int64)
                    b = b[129:]
                else:
                    raise ValueError("invalid DQT precision")
        elif tag == 0xC4:  # DHT
            b = body
            while b:
                if len(b) < 17:
                    raise ValueError("truncated DHT")
                tc, th = b[0] >> 4, b[0] & 0x0F
                counts = list(b[1:17])
                n = sum(counts)
                if len(b) < 17 + n:
                    raise ValueError("truncated DHT")
                symbols = list(b[17 : 17 + n])
                codes = _canonical_codes(counts, symbols)
                huff[(tc, th)] = {
                    (code, length): sym for sym, (code, length) in codes.items()
                }
                b = b[17 + n :]
        elif tag == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported precision {prec} (8 only)")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc} (1/3)")
            if w <= 0 or h <= 0:
                raise ValueError("invalid JPEG dimensions")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                h_i, v_i = hv >> 4, hv & 0x0F
                if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
                    raise ValueError("invalid sampling factors")
                comps.append({"id": cid, "h": h_i, "v": v_i, "tq": tq})
            if nc == 1:
                # T.81 A.2.2: a single-component scan is NON-interleaved
                # -- one 8x8 data unit per MCU over ceil(w/8) x
                # ceil(h/8), regardless of declared sampling factors
                # (which only matter relative to other components).
                # Forcing h=v=1 gives exactly that geometry.
                comps[0]["h"] = comps[0]["v"] = 1
            frame = {"w": w, "h": h, "comps": comps}
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "non-baseline JPEG (progressive/extended/arithmetic)"
            )
        elif tag == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            if ns != len(frame["comps"]):
                raise ValueError("partial-scan JPEG unsupported (baseline)")
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError("scan references unknown component")
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            break
        # APPn / COM / anything else with a length: skipped.
    # --- entropy-coded scan ------------------------------------------
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in frame["comps"]:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in frame["comps"]}
    n_restart = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align_restart(n_restart)
                n_restart += 1
                preds = {c["id"]: 0 for c in frame["comps"]}
            for comp, td, ta in scan:
                if (0, td) not in huff or (1, ta) not in huff:
                    raise ValueError("scan references undefined Huffman table")
                if comp["tq"] not in quant:
                    raise ValueError("component references undefined DQT")
                qtbl = quant[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _decode_huffman(reader, huff[(0, td)])
                        diff = _extend(reader.bits(size), size)
                        preds[comp["id"]] += diff
                        zz[0] = preds[comp["id"]]
                        k = 1
                        while k < 64:
                            sym = _decode_huffman(reader, huff[(1, ta)])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("invalid AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[ZIGZAG] = zz * qtbl
                        block = (
                            _BASIS.T @ coeffs.reshape(8, 8) @ _BASIS + 128.0
                        )
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_index += 1
    # --- upsample + color convert -------------------------------------
    comps = frame["comps"]
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(ch), 0, 255).astype(np.uint8) for ch in (r, g, b)],
        axis=-1,
    )
    return w, h, 3, rgb.tobytes()


def jpeg_decoder(payload: bytes, feat_dim: int) -> tuple[int, int, list[float]]:
    """Pluggable-decoder contract (same as png_decoder/ppm_decoder):
    decode + pool into feat_dim slice means scaled to [-1, 1]."""
    from .multimodal import _pool_raster

    width, height, _nc, raster = jpeg_raster(payload)
    return width, height, _pool_raster(raster, 255, feat_dim)
