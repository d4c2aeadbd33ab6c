"""Baseline-sequential JPEG (ITU-T T.81) encode + decode in
stdlib + numpy — the last ubiquitous media format the multimodal path
lacked (PNG, GIF, WAV are in multimodal.py). No external codec: the
writer emits real JFIF files (Annex K standard Huffman tables, unit
quantization tables, proper bitstream with 0xFF00 byte stuffing) and
the decoder runs the full inverse pipeline — marker walk, DQT/SOF0/
DHT/SOS parse, canonical Huffman decode, DC-prediction + AC run-length
entropy decode, dequantization, zigzag inversion, floating IDCT
(numpy), level shift, 4:2:0 chroma upsampling, and JFIF YCbCr->RGB —
inside Arrow batches via mapInPandas. Payloads never visit the driver;
malformed payloads raise with the media id.

Exactness contract (what lets a DuckDB oracle state the decoded means
ARITHMETICALLY despite JPEG being lossy): the synthesized corpora use
blocks that are CONSTANT per 8x8 (grayscale) or per 16x16 MCU (color),
so every FDCT is a bare integral DC coefficient (8*(v-128)) with zero
AC — with unit quantization tables the whole transform pipeline is
the identity and decode reproduces each block value exactly. The color
corpus additionally replays the JFIF color conversions with explicit
floor(x + 0.5) rounding and [0, 255] clamping on BOTH sides, every
literal CAST to DOUBLE in the SQL so DuckDB cannot fall into DECIMAL
arithmetic. The AC/Huffman/IDCT paths beyond DC are pinned by pytest
against an independent numpy IDCT reference over random coefficient
blocks (tests/test_multimodal_property.py) — the gate query proves the
end-to-end container + entropy + transform pipeline, the property test
the general transform math.

Scale shape: synthesis and decode are map-only mapInPandas stages —
zero shuffles at any corpus size, the same contract as the PNG/GIF/WAV
decoders.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# ITU-T T.81 Annex K standard Huffman tables (public specification
# constants): (BITS counts for code lengths 1..16, HUFFVAL symbols).
# ---------------------------------------------------------------------------

_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# zigzag position -> raster index within the 8x8 block
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) canonical Huffman assignment: codes
    in increasing length, value order within a length (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _idct_matrix():
    import numpy as np

    m = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = (1.0 / (2.0 ** 0.5)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


def idct_2d(coeffs):
    """Floating 2-D inverse DCT of an 8x8 coefficient block (T.81
    A.3.3): spatial = M^T @ S @ M with M[u,x] = C(u)/2 cos((2x+1)u
    pi/16). Exposed for the pytest reference comparison."""
    import numpy as np

    m = _idct_matrix()
    return m.T @ np.asarray(coeffs, dtype=np.float64) @ m


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        while self.nbits:  # pad with 1s (T.81 F.1.2.3)
            self.put(1, 1)
        return bytes(self.out)


def _encode_block(bw, coeffs, dc_codes, ac_codes, pred: int) -> int:
    """Entropy-encode one quantized 8x8 block (zigzag, DC diff
    category + AC run/size with ZRL and EOB); returns the new DC
    predictor."""
    zz = [int(coeffs[i // 8][i % 8]) for i in _ZIGZAG]
    diff = zz[0] - pred
    size = diff.bit_length() if diff > 0 else (-diff).bit_length()
    code, ln = dc_codes[size]
    bw.put(code, ln)
    if size:
        bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL: 16 zeros
            bw.put(c, l)
            run -= 16
        v = zz[k]
        size = v.bit_length() if v > 0 else (-v).bit_length()
        c, l = ac_codes[(run << 4) | size]
        bw.put(c, l)
        bw.put(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]  # EOB
        bw.put(c, l)
    return zz[0]


def _dht_segment(tc: int, th: int, table) -> bytes:
    bits, vals = table
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_unit(tq: int) -> bytes:
    body = bytes([tq]) + bytes([1] * 64)
    return b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body


def tiny_jpeg_bytes(width, height, y_blocks, cb_blocks=None, cr_blocks=None):
    """Minimal valid baseline JFIF file from QUANTIZED coefficient
    blocks (unit quantization tables): grayscale when only
    ``y_blocks`` (grid [by][bx] of 8x8 integer matrices) is given,
    4:2:0 YCbCr when ``cb_blocks``/``cr_blocks`` (each half the Y grid
    in both axes) are too. Real entropy coding — standard tables, DC
    prediction per component, ZRL/EOB, byte stuffing."""
    color = cb_blocks is not None
    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + (len(jfif) + 2).to_bytes(2, "big") + jfif
    out += _dqt_unit(0)
    if color:
        out += _dqt_unit(1)
    ncomp = 3 if color else 1
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([ncomp])
    if color:
        sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    else:
        sof += bytes([1, 0x11, 0])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    if color:
        out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    sos = bytes([ncomp])
    sos += bytes([1, 0x00])
    if color:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    dc_l, ac_l = _canonical_codes(*_DC_LUMA), _canonical_codes(*_AC_LUMA)
    bw = _BitWriter()
    if not color:
        pred = 0
        for row in y_blocks:
            for blk in row:
                pred = _encode_block(bw, blk, dc_l, ac_l, pred)
    else:
        dc_c = _canonical_codes(*_DC_CHROMA)
        ac_c = _canonical_codes(*_AC_CHROMA)
        preds = [0, 0, 0]
        for my in range(len(cb_blocks)):
            for mx in range(len(cb_blocks[0])):
                for dy in range(2):
                    for dx in range(2):
                        preds[0] = _encode_block(
                            bw, y_blocks[2 * my + dy][2 * mx + dx],
                            dc_l, ac_l, preds[0],
                        )
                preds[1] = _encode_block(
                    bw, cb_blocks[my][mx], dc_c, ac_c, preds[1]
                )
                preds[2] = _encode_block(
                    bw, cr_blocks[my][mx], dc_c, ac_c, preds[2]
                )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    stuffing removal; raises on a stray marker inside the scan."""

    def __init__(self, mid, data: bytes, pos: int):
        self.mid, self.data, self.pos = mid, data, pos
        self.acc, self.nbits = 0, 0

    def bit(self) -> int:
        if not self.nbits:
            if self.pos >= len(self.data):
                raise ValueError(
                    f"jpeg {self.mid}: truncated entropy-coded data"
                )
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError(
                        f"jpeg {self.mid}: truncated after 0xFF"
                    )
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"jpeg {self.mid}: marker 0xFF{nxt:02x} inside scan"
                    )
            self.acc, self.nbits = b, 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _build_decode_tree(bits, vals):
    """(length, code) -> symbol lookup for canonical codes."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode(br, tree, mid):
    code, ln = 0, 0
    while ln < 17:
        code = (code << 1) | br.bit()
        ln += 1
        sym = tree.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError(f"jpeg {mid}: invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(br, dc_tree, ac_tree, qt, pred, mid):
    """One 8x8 block: returns (numpy spatial block BEFORE level shift,
    new DC predictor)."""
    import numpy as np

    zz = [0] * 64
    size = _huff_decode(br, dc_tree, mid)
    diff = _extend(br.bits(size), size) if size else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _huff_decode(br, ac_tree, mid)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError(f"jpeg {mid}: bad AC symbol {sym:02x}")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError(f"jpeg {mid}: AC run past block end")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    coeffs = np.zeros((8, 8), dtype=np.float64)
    for i, ri in enumerate(_ZIGZAG):
        coeffs[ri // 8][ri % 8] = zz[i] * qt[i]
    return idct_2d(coeffs), pred


def _parse_jpeg(mid, content: bytes):
    """Full baseline decode: (width, height, mode, planes) where
    planes is [numpy uint8 h x w] — [Y] for grayscale, [R, G, B] for
    color (4:2:0 or 4:4:4 chroma). Raises ValueError with the media id
    on any malformed structure, non-baseline frame, or truncation."""
    import numpy as np

    data = bytes(content)
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError(f"jpeg {mid}: missing SOI")
    pos = 2
    qts, hts = {}, {}
    frame = None
    while True:
        if pos + 2 > len(data):
            raise ValueError(f"jpeg {mid}: truncated marker stream")
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg {mid}: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before scan
            raise ValueError(f"jpeg {mid}: EOI before SOS")
        if pos + 2 > len(data):
            raise ValueError(f"jpeg {mid}: truncated marker stream")
        ln = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + ln]
        if len(seg) != ln - 2:
            raise ValueError(f"jpeg {mid}: truncated segment {marker:02x}")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError(f"jpeg {mid}: 16-bit DQT unsupported")
                qts[tq] = list(seg[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                hts[(tc, th)] = _build_decode_tree(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            comps = []
            for c in range(seg[5]):
                o = 6 + 3 * c
                comps.append(
                    (seg[o], seg[o + 1] >> 4, seg[o + 1] & 0x0F, seg[o + 2])
                )
            frame = (w, h, comps)
            pos += ln
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg {mid}: only baseline sequential (SOF0) supported,"
                f" got SOF marker 0xff{marker:02x}"
            )
        elif marker == 0xDD:
            raise ValueError(f"jpeg {mid}: restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError(f"jpeg {mid}: SOS before SOF0")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            pos += ln
            break
        if marker not in (0xC0,):
            pos += ln
    w, h, comps = frame
    if w < 1 or h < 1:
        raise ValueError(f"jpeg {mid}: bad dimensions {w}x{h}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(mid, data, pos)
    planes = {}
    preds = {c[0]: 0 for c in comps}
    for cid, hi, vi, tq in comps:
        planes[cid] = np.zeros((mcuy * vi * 8, mcux * hi * 8), np.float64)
    by_id = {c[0]: c for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, dct, act in scan:
                _, hi, vi, tq = by_id[cid]
                if tq not in qts or (0, dct) not in hts or (1, act) not in hts:
                    raise ValueError(f"jpeg {mid}: missing table for {cid}")
                for dy in range(vi):
                    for dx in range(hi):
                        blk, preds[cid] = _decode_block(
                            br, hts[(0, dct)], hts[(1, act)],
                            qts[tq], preds[cid], mid,
                        )
                        y0 = (my * vi + dy) * 8
                        x0 = (mx * hi + dx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk
    # level shift + clamp, upsample each component to full resolution
    # by sample replication, crop to (h, w)
    full = {}
    for cid, hi, vi, tq in comps:
        p = np.clip(np.floor(planes[cid] + 128.0 + 0.5), 0.0, 255.0)
        p = np.repeat(np.repeat(p, hmax // hi, axis=1), vmax // vi, axis=0)
        full[cid] = p[:h, :w]
    if len(comps) == 1:
        return w, h, "L", [full[comps[0][0]].astype(np.uint8)]
    if len(comps) != 3:
        raise ValueError(f"jpeg {mid}: {len(comps)}-component frame")
    y = full[comps[0][0]]
    cb = full[comps[1][0]] - 128.0
    cr = full[comps[2][0]] - 128.0
    r = np.clip(np.floor(y + 1.402 * cr + 0.5), 0.0, 255.0)
    g = np.clip(
        np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5), 0.0, 255.0
    )
    b = np.clip(np.floor(y + 1.772 * cb + 0.5), 0.0, 255.0)
    return w, h, "RGB", [p.astype(np.uint8) for p in (r, g, b)]


def decode_jpeg_features(df: DataFrame) -> DataFrame:
    """REAL JPEG decode over Arrow batches: (media_id, n_bytes, width,
    height, mode, mean_luma) — exact gray mean for mode 'L', the same
    ITU-R 601-2 integer weighting as the PNG decoder for 'RGB'. Same
    schema as decode_png_features, so the two are drop-in
    interchangeable. Map-only; malformed payloads raise."""
    from .multimodal import REAL_IMAGE_FEATURE_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nb, ws, hs, modes, lumas = [], [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, mode, planes = _parse_jpeg(mid, content)
                if mode == "L":
                    num = int(planes[0].astype("int64").sum())
                    den = w * h
                else:
                    num = int(
                        299 * planes[0].astype("int64").sum()
                        + 587 * planes[1].astype("int64").sum()
                        + 114 * planes[2].astype("int64").sum()
                    )
                    den = 1000 * w * h
                ids.append(mid)
                nb.append(len(bytes(content)))
                ws.append(w)
                hs.append(h)
                modes.append(mode)
                lumas.append(num / den)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": pd.Series(nb, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mode": modes,
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return df.mapInPandas(batches, schema=REAL_IMAGE_FEATURE_SCHEMA)


def _const_block(v: int):
    """Quantized coefficients of a constant-v 8x8 block under unit
    quantization: DC = 8*(v-128) (integral — the reason the lossy
    pipeline is exact on this corpus), zero AC."""
    import numpy as np

    blk = np.zeros((8, 8), dtype=np.int64)
    blk[0][0] = 8 * (v - 128)
    return blk


def synthesize_jpeg_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic grayscale JPEG corpus: 8x8-constant blocks with
    value (id*31 + bx*17 + by*7) % 256 over an id-derived block grid —
    integral DC, zero AC, unit quantization, so decode reproduces
    every block value exactly and the q226 oracle states the mean
    arithmetically."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            payloads = []
            for i in ids:
                i = int(i)
                bw_, bh_ = 1 + i % 3, 1 + i % 2
                grid = [
                    [
                        _const_block((i * 31 + bx * 17 + by * 7) % 256)
                        for bx in range(bw_)
                    ]
                    for by in range(bh_)
                ]
                payloads.append(tiny_jpeg_bytes(8 * bw_, 8 * bh_, grid))
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, content binary"
    )


def _jfif_forward(r: int, g: int, b: int):
    """JFIF RGB -> YCbCr with floor(x + 0.5) rounding and [0, 255]
    clamping — the exact arithmetic the q227 oracle replays in SQL
    (every literal CAST to DOUBLE there)."""
    import math

    y = 0.299 * r + 0.587 * g + 0.114 * b + 0.5
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128 + 0.5
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128 + 0.5
    clamp = lambda x: int(min(max(math.floor(x), 0.0), 255.0))  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def synthesize_jpeg_color_corpus(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """4:2:0 color sibling: constant RGB per 16x16 MCU (channel values
    arithmetic in (id, mx, my)), converted to YCbCr with the exact
    JFIF rounding above — constants survive subsampling exactly, all
    four Y blocks of an MCU share one integral DC, and the q227 oracle
    replays conversion + decode arithmetically."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            payloads = []
            for i in ids:
                i = int(i)
                mw, mh = 1 + i % 2, 1 + i % 3
                yg = [[None] * (2 * mw) for _ in range(2 * mh)]
                cbg = [[None] * mw for _ in range(mh)]
                crg = [[None] * mw for _ in range(mh)]
                for my in range(mh):
                    for mx in range(mw):
                        r = (i * 31 + mx * 17 + my * 7) % 256
                        g = (i * 29 + mx * 13 + my * 11) % 256
                        b = (i * 37 + mx * 19 + my * 5) % 256
                        y, cb, cr = _jfif_forward(r, g, b)
                        for dy in range(2):
                            for dx in range(2):
                                yg[2 * my + dy][2 * mx + dx] = _const_block(y)
                        cbg[my][mx] = _const_block(cb)
                        crg[my][mx] = _const_block(cr)
                payloads.append(
                    tiny_jpeg_bytes(16 * mw, 16 * mh, yg, cbg, crg)
                )
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, content binary"
    )
