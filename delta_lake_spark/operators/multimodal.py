"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery (schemas, mapInPandas batching, partitioning)
is real and tested, and decoding is REAL wherever the format is
parseable with the standard library alone: ``decode_wav_meta`` walks
RIFF/PCM chunk structure (q171), ``gif_frame_index`` walks GIF block
structure (q172), ``decode_png_features`` runs the full PNG pipeline —
chunk CRCs, IHDR, zlib inflate, all five scanline defilters —
(q173), and ``segment_wav_energy`` decodes actual PCM samples and
segments them by windowed RMS (q174). ``decode_image_features(...,
real_decode=True)`` uses PIL when importable (any format) and falls
back to the stdlib PNG pipeline when not, so the real branch works in
every environment. ``gif_frame_pixels`` fully LZW-decodes every GIF
frame's raster (q192) — video frame pixel decode is REAL for the one
container whose codec is pure stdlib. The only remaining stubs are
the pieces that NEED an absent model/codec — ffmpeg-class video
codecs (frame_sample's checksum stand-in) and the ASR model
downstream of the real segmenter — each clearly marked, with the
distributed plumbing real and oracle-checked around them.

Scale notes: mapInPandas streams Arrow batches (no per-row Python
overhead); binary payloads never pass through the driver; batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch. Partition by a
content-hash bucket upstream if payload sizes are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, content binary, mime string, width int, height int"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, n_bytes int, head_byte int, byte_sum long, "
    "fake_width int, fake_height int"
)

REAL_IMAGE_FEATURE_SCHEMA = (
    "media_id long, n_bytes int, width int, height int, mode string, "
    "mean_luma double"
)


def _probe_image_decoder():
    """Return the PIL Image module if an image decode library is
    importable, else None. Probed at call time (not import) so
    installing a decoder upgrades the operator without code changes."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _png_paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec 9.4): pick whichever of left /
    up / up-left is closest to a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_row(t: int, row: bytes, prev: bytes, bpp: int = 1) -> bytes:
    """Apply PNG filter type ``t`` (0-4) to a scanline of ``bpp`` bytes
    per pixel: the ENCODER side of the spec's defiltering equations
    (9.2: a/b/c reference the byte ``bpp`` positions back, not 1), so
    the fixtures can exercise every reconstruction branch of
    :func:`decode_png_features` at both strides."""
    if t == 0:
        return bytes(row)
    out = bytearray()
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0  # left
        b = prev[i] if prev else 0  # up
        c = (prev[i - bpp] if i >= bpp else 0) if prev else 0  # up-left
        if t == 1:
            pred = a
        elif t == 2:
            pred = b
        elif t == 3:
            pred = (a + b) // 2
        elif t == 4:
            pred = _png_paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {t}")
        out.append((x - pred) & 0xFF)
    return bytes(out)


def tiny_png_bytes(
    rows: list[list], filters: list[int] | None = None, color: str = "L"
) -> bytes:
    """Hand-assembled 8-bit PNG from a pixel matrix — a deterministic
    in-repo image fixture (stdlib only: zlib + struct), so the REAL
    decode branches of :func:`decode_png_features` /
    :func:`decode_image_features` can be exercised by tests without
    shipping binary blobs in the repo. ``rows`` is a list of
    equal-length scanlines: 0-255 gray values for ``color="L"``
    (color type 0), (r, g, b) triples for ``color="RGB"`` (color
    type 2). ``filters`` optionally names the per-scanline filter
    type (0-4, default all 0/None) so every defilter path is
    coverable at both strides."""
    import struct
    import zlib

    if not rows or not rows[0]:
        raise ValueError("pixel matrix must be non-empty")
    width, height = len(rows[0]), len(rows)
    if any(len(r) != width for r in rows):
        raise ValueError("all pixel rows must have equal length")
    if filters is None:
        filters = [0] * height
    if len(filters) != height:
        raise ValueError("filters must name one type per scanline")
    if color == "L":
        ctype, bpp = 0, 1
        raw_rows = [bytes(r) for r in rows]
    elif color == "RGB":
        ctype, bpp = 2, 3
        raw_rows = [bytes(v for px in r for v in px) for r in rows]
    else:
        raise ValueError("color must be 'L' or 'RGB'")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    # each scanline: filter-type byte + filtered bytes
    raw = bytearray()
    prev = b""
    for rb, t in zip(raw_rows, filters):
        raw += bytes((t,)) + _png_filter_row(t, rb, prev, bpp)
        prev = rb
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapt the documents table into a media-shaped table (binary
    payload + metadata) for exercising the multimodal path: content =
    utf-8 bytes of the text, a deterministic stand-in for image bytes."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        (F.length(content) % 640).cast("int").alias("width"),
        (F.length(content) % 480).cast("int").alias("height"),
    )


def _parse_png_pixels(mid, content: bytes) -> tuple[int, int, str, list]:
    """Stdlib PNG decode of an 8-bit grayscale (color type 0) or RGB
    (color type 2) payload: chunk walk with CRC verification, IHDR
    parse, IDAT inflate, scanline defilter (types 0-4 per spec
    9.2/9.4, a/b/c at the bytes-per-pixel stride). Returns (width,
    height, mode, rows) with rows the reconstructed scanlines as raw
    bytes (bpp-strided). Malformed payloads raise with the media
    id."""
    import struct
    import zlib

    b = bytes(content)
    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"media {mid}: not a PNG payload")
    off, ihdr, idat = 8, None, bytearray()
    while off + 8 <= len(b):
        (size,) = struct.unpack(">I", b[off : off + 4])
        tag = b[off + 4 : off + 8]
        data = b[off + 8 : off + 8 + size]
        if len(data) != size or off + 12 + size > len(b):
            raise ValueError(f"media {mid}: truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack(">I", b[off + 8 + size : off + 12 + size])
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"media {mid}: PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        off += 12 + size
    if ihdr is None or not idat:
        raise ValueError(f"media {mid}: missing PNG IHDR/IDAT chunk")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"media {mid}: unsupported PNG format (need 8-bit grayscale "
            f"or RGB, non-interlaced; got depth={depth} color={color} "
            f"interlace={interlace})"
        )
    bpp = 1 if color == 0 else 3
    stride = width * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"media {mid}: corrupt PNG IDAT stream ({e})")
    if len(raw) != (stride + 1) * height:
        raise ValueError(f"media {mid}: PNG scanline data size mismatch")
    rows = []
    prev = bytes(stride)
    for r in range(height):
        line = raw[r * (stride + 1) : (r + 1) * (stride + 1)]
        t, f = line[0], line[1:]
        recon = bytearray()
        for i, x in enumerate(f):
            a = recon[i - bpp] if i >= bpp else 0
            bb = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if t == 0:
                pred = 0
            elif t == 1:
                pred = a
            elif t == 2:
                pred = bb
            elif t == 3:
                pred = (a + bb) // 2
            elif t == 4:
                pred = _png_paeth(a, bb, c)
            else:
                raise ValueError(
                    f"media {mid}: unknown PNG filter type {t}"
                )
            recon.append((x + pred) & 0xFF)
        prev = bytes(recon)
        rows.append(prev)
    return width, height, ("L" if bpp == 1 else "RGB"), rows


def _parse_png(mid, content: bytes) -> tuple[int, int, int, str, float]:
    """Feature view over :func:`_parse_png_pixels`: (n_bytes, width,
    height, mode, mean_luma) where mean_luma is the exact pixel mean
    for grayscale and the ITU-R 601-2 weighted mean
    (299R + 587G + 114B) / 1000 for RGB."""
    width, height, mode, rows = _parse_png_pixels(mid, content)
    if mode == "L":
        num = sum(sum(r) for r in rows)
        den = width * height
    else:
        num = sum(
            299 * r[i] + 587 * r[i + 1] + 114 * r[i + 2]
            for r in rows
            for i in range(0, 3 * width, 3)
        )
        den = 1000 * width * height
    return len(bytes(content)), width, height, mode, num / den


def decode_png_features(df: DataFrame) -> DataFrame:
    """REAL image decode — not a stub, no external library: full
    stdlib PNG pipeline (chunk walk + CRC check, IHDR parse, zlib
    inflate, per-scanline defilter for all five filter types at both
    the grayscale and RGB strides) over Arrow batches, emitting
    dimensions, mode, and mean luminance per payload (exact gray mean
    for mode 'L', ITU-R 601-2 weighted mean for 'RGB'; see
    _parse_png). Same output schema as
    decode_image_features(real_decode=True), so the two are drop-in
    interchangeable. Malformed payloads raise with the media id.
    Map-only mapInPandas; payloads never visit the driver."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nb, ws, hs, modes, lumas = [], [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n, w, h, mode, luma = _parse_png(mid, content)
                ids.append(mid)
                nb.append(n)
                ws.append(w)
                hs.append(h)
                modes.append(mode)
                lumas.append(luma)
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


def synthesize_png_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG corpus from an id column (cf.
    synthesize_wav_corpus / synthesize_gif_corpus): pixel matrix and
    per-scanline filter types derive arithmetically from the id —
    filter = (id + row) % 5, so every document exercises several
    defilter branches and the corpus covers all five — letting the
    q173 oracle state width/height/mean luminance without parsing any
    binary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 3 + i % 6, 2 + i % 5
                rows = [
                    [(i * 31 + r * 17 + c * 7) % 256 for c in range(w)]
                    for r in range(h)
                ]
                payloads.append(
                    tiny_png_bytes(rows, filters=[(i + r) % 5 for r in range(h)])
                )
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, content binary"
    )


def synthesize_mixed_image_corpus(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Mixed-format sibling of :func:`synthesize_png_corpus` — the
    real-corpus shape where a dedup key must sniff its payload: EVEN
    ids carry the exact PNG of synthesize_png_corpus (w = 3 + id % 6,
    h = 2 + id % 5, pixel (id*31 + r*17 + c*7) % 256, cycling
    filters); ODD ids carry a baseline JPEG of 8x8-CONSTANT blocks
    (grid (1 + id % 3) x (1 + id % 2), block value
    (id*31 + bx*17 + by*7) % 256 — integral DC, zero AC, unit
    quantization, so the lossy pipeline reproduces every block value
    exactly and an oracle states the decoded raster arithmetically)."""
    from .jpeg import _const_block, tiny_jpeg_bytes

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            payloads = []
            for i in ids:
                i = int(i)
                if i % 2 == 0:
                    w, h = 3 + i % 6, 2 + i % 5
                    rows = [
                        [(i * 31 + r * 17 + c * 7) % 256 for c in range(w)]
                        for r in range(h)
                    ]
                    payloads.append(
                        tiny_png_bytes(
                            rows, filters=[(i + r) % 5 for r in range(h)]
                        )
                    )
                else:
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


def synthesize_png_rgb_corpus(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """RGB sibling of :func:`synthesize_png_corpus`: channel values
    derive arithmetically from (id, row, col, channel) and the
    per-scanline filters from (id + row) % 5, exercising the bpp=3
    defilter stride (a/b/c three bytes back) the grayscale corpus
    cannot — so the q175 oracle states the ITU-R 601-2 mean luminance
    without parsing any binary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 2 + i % 5, 1 + i % 4
                rows = [
                    [
                        tuple(
                            (i * 31 + r * 17 + c * 7 + ch * 13) % 256
                            for ch in range(3)
                        )
                        for c in range(w)
                    ]
                    for r in range(h)
                ]
                payloads.append(
                    tiny_png_bytes(
                        rows,
                        filters=[(i + r) % 5 for r in range(h)],
                        color="RGB",
                    )
                )
            yield pd.DataFrame({"media_id": ids, "content": payloads})

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, content binary"
    )


def image_dhash(df: DataFrame, hash_size: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the standard
    cheap near-duplicate key for image corpora (robust to re-encoding
    and mild rescaling, unlike the byte md5). The payload format is
    SNIFFED from its magic bytes: PNG goes through the REAL stdlib
    decode (:func:`_parse_png_pixels`), JPEG through the full baseline
    decoder (:func:`~delta_lake_spark.operators.jpeg._parse_jpeg`) —
    real image corpora are overwhelmingly JPEG, so the dedup key must
    not be PNG-only. RGB collapses to integer ITU-R 601 luma
    ((299 r + 587 g + 114 b) // 1000), nearest-neighbor resample to
    (hash_size+1) x hash_size with the module's exact
    ``src = (dst * src_dim) // dst_dim`` mapping, then one bit per
    horizontally adjacent pair (left < right), emitted as a
    2-hex-chars-per-row string so the hash is engine-portable without
    signed-64-bit shift corner cases. Every step is integer-exact, so
    an external engine replays the hash from the synthesis arithmetic.
    The raster math (luma collapse, resample, bit pack) is vectorized
    numpy over the whole image — no per-pixel Python in the hot path.
    Malformed or non-image payloads raise with the media id. Map-only
    mapInPandas. Returns (media_id, dhash string of 2*hash_size hex
    chars)."""
    if hash_size <= 0:
        raise ValueError("hash_size must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg import _parse_jpeg

        ow, oh = hash_size + 1, hash_size
        weights = (
            np.int64(1) << np.arange(hash_size - 1, -1, -1, dtype=np.int64)
        )

        def one(mid, content) -> str:
            content = bytes(content)
            if content[:8] == b"\x89PNG\r\n\x1a\n":
                w, h, mode, rows = _parse_png_pixels(mid, content)
                # rows are raw bpp-strided scanline bytes
                arr = np.frombuffer(b"".join(rows), dtype=np.uint8).astype(
                    np.int64
                )
                if mode == "RGB":
                    arr = arr.reshape(h, w, 3)
                    luma = (
                        299 * arr[:, :, 0]
                        + 587 * arr[:, :, 1]
                        + 114 * arr[:, :, 2]
                    ) // 1000
                else:
                    luma = arr.reshape(h, w)
            elif content[:2] == b"\xff\xd8":
                w, h, mode, planes = _parse_jpeg(mid, content)
                if mode == "L":
                    luma = planes[0].astype(np.int64)
                else:
                    luma = (
                        299 * planes[0].astype(np.int64)
                        + 587 * planes[1].astype(np.int64)
                        + 114 * planes[2].astype(np.int64)
                    ) // 1000
            else:
                raise ValueError(
                    f"image_dhash media_id={mid}: payload is neither"
                    " PNG nor JPEG"
                )
            grid = luma[
                np.ix_((np.arange(oh) * h) // oh, (np.arange(ow) * w) // ow)
            ]
            row_bytes = (
                (grid[:, 1:] > grid[:, :-1]).astype(np.int64) * weights
            ).sum(axis=1)
            return "".join(f"{int(b):02x}" for b in row_bytes)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": [
                        one(mid, content)
                        for mid, content in zip(
                            pdf["media_id"], pdf["content"]
                        )
                    ],
                }
            )

    return df.mapInPandas(batches, schema="media_id long, dhash string")


def resize_image(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize — not a stub, no external library: each PNG
    payload is decoded by the full stdlib pipeline
    (:func:`_parse_png_pixels`), resampled to (out_w, out_h) by
    nearest-neighbor (src = (dst * src_dim) // dst_dim — the exact,
    engine-replayable mapping; up- and down-scale both work), and
    RE-ENCODED as a valid PNG of the same mode, so the output column
    feeds any downstream decoder — the standard normalize-resolution
    step of an image training pipeline. Returns (media_id, content).
    Malformed payloads raise with the media id. Map-only mapInPandas;
    payloads never visit the driver."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize dimensions must be positive")

    def resize_one(mid, content: bytes) -> bytes:
        w, h, mode, rows = _parse_png_pixels(mid, content)
        bpp = 1 if mode == "L" else 3
        out_rows = []
        for r in range(out_h):
            sr = rows[(r * h) // out_h]
            if bpp == 1:
                out_rows.append([sr[(c * w) // out_w] for c in range(out_w)])
            else:
                out_rows.append(
                    [
                        tuple(sr[3 * ((c * w) // out_w) + ch] for ch in range(3))
                        for c in range(out_w)
                    ]
                )
        return tiny_png_bytes(out_rows, color=mode)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        resize_one(mid, content)
                        for mid, content in zip(
                            pdf["media_id"], pdf["content"]
                        )
                    ],
                }
            )

    return df.mapInPandas(batches, schema="media_id long, content binary")


def decode_image_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """'Decode' binary image content into features via mapInPandas.

    ``real_decode=True`` probes for an image library (PIL) at call
    time: when present, payloads are decoded by PIL (any format it
    knows) inside the same Arrow-batched plan; when absent it falls
    back to the stdlib PNG pipeline (:func:`decode_png_features` —
    real inflate + defilter, grayscale-8 subset), so the real branch
    works in every environment. The default path computes
    deterministic byte-level pseudo-features (length, first byte, byte
    sum, fake dimensions) for ARBITRARY binary payloads, which keeps
    the Arrow batch shape, schema, and distributed execution identical
    to a real decoder — the tested plumbing is shared by all paths.
    """
    if real_decode:
        if _probe_image_decoder() is None:
            return decode_png_features(df)

        def real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            image_mod = _probe_image_decoder()  # re-probe on the executor
            for pdf in it:
                ids, nb, ws, hs, modes, lumas = [], [], [], [], [], []
                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    img = image_mod.open(io.BytesIO(content))
                    gray = img.convert("L")
                    hist = gray.histogram()
                    total = sum(hist) or 1
                    ids.append(mid)
                    nb.append(len(content))
                    ws.append(img.width)
                    hs.append(img.height)
                    modes.append(img.mode)
                    lumas.append(sum(i * c for i, c in enumerate(hist)) / total)
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

        return df.mapInPandas(real_batches, schema=REAL_IMAGE_FEATURE_SCHEMA)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(len).astype("int32"),
                    "head_byte": content.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "byte_sum": content.map(lambda b: int(sum(b))).astype("int64"),
                    "fake_width": content.map(lambda b: len(b) % 640).astype("int32"),
                    "fake_height": content.map(lambda b: len(b) % 480).astype("int32"),
                }
            )

    return df.mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB for video frame sampling: emits one row per sampled 'frame'
    offset (every_n_bytes stride over the payload) with a deterministic
    frame checksum. A real implementation would demux with ffmpeg —
    unavailable here; the row-explosion shape (1 row in, many out via
    mapInPandas) matches the real operator's plan.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_off, out_ck = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for off in range(0, len(content), every_n_bytes):
                    chunk = content[off : off + every_n_bytes]
                    out_ids.append(mid)
                    out_off.append(off)
                    out_ck.append(int(sum(chunk)) % 65536)
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_offset": out_off, "frame_checksum": out_ck}
            )

    return df.mapInPandas(
        batches, schema="media_id long, frame_offset int, frame_checksum int"
    )


def audio_chunk_plan(df: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Plan fixed-size chunking of audio payloads (the pre-step of any
    chunked transcription/embedding pipeline): one row per (media,
    chunk) with byte offsets. Pure JVM arithmetic on the payload length
    — sequence+explode, no Python, no shuffle; the expensive per-chunk
    decode happens downstream (transcribe_stub) on already-exploded
    rows so it parallelizes past the number of input files.
    """
    n = F.octet_length(F.col("content"))
    n_chunks = F.ceil(n / F.lit(chunk_bytes)).cast("int")
    idx = F.explode(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)), F.lit(1))
    )
    out = df.select(F.col("media_id"), n.alias("__n"), idx.alias("chunk_id"))
    start = F.col("chunk_id") * chunk_bytes
    return out.select(
        "media_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_byte"),
        F.least(F.lit(chunk_bytes), F.col("__n") - start)
        .cast("long")
        .alias("n_bytes"),
    )


def tiny_wav_bytes(
    n_frames: int,
    sample_rate: int,
    channels: int = 1,
    bits: int = 16,
    seed: int = 0,
) -> bytes:
    """Hand-assembled PCM WAV (RIFF/fmt/data) from stdlib struct — the
    audio sibling of :func:`tiny_png_bytes`. Samples are a
    deterministic sawtooth of the seed, so the payload (not just the
    header) is reproducible across engines and runs. Byte-identical to
    what the stdlib ``wave`` writer produces for the same params
    (pytest-pinned), so the parser below is tested against a second,
    independent implementation of the format."""
    import struct

    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16 (PCM)")
    sampwidth = bits // 8
    block_align = channels * sampwidth
    byte_rate = sample_rate * block_align
    frames = bytearray()
    for i in range(n_frames):
        for c in range(channels):
            v = (seed * 7 + i * 31 + c * 13) % 251
            if bits == 8:
                frames.append(v)  # 8-bit PCM is unsigned
            else:
                frames += struct.pack("<h", (v - 125) * 200)
    data = bytes(frames)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _lzw_encode_gif(pixels: list[int], min_code_size: int) -> bytes:
    """Minimal valid GIF-flavor LZW: emit CLEAR, then one literal code
    per pixel, then EOI, packing codes LSB-first and widening the code
    size as the (never-referenced) dictionary grows — legal, if
    uncompressed, LZW that any decoder accepts."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    next_code = eoi + 1
    out = bytearray()
    acc = n_acc = 0

    def emit(code: int):
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    emit(clear)
    first = True
    for p in pixels:
        emit(p)
        # a decoder adds one dictionary entry per code AFTER the first
        # post-clear code, and widens when the slot count reaches
        # 2^width (canonical giflib behavior, 12-bit cap) — mirror it
        # exactly or the bit stream desynchronizes
        if first:
            first = False
        elif next_code < 4096:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
    emit(eoi)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int) -> list:
    """GIF-flavor LZW decode (stdlib only): LSB-first code unpacking,
    CLEAR/EOI handling, the k-omega-k case for not-yet-defined codes,
    canonical giflib width growth with the 12-bit cap. The inverse of
    _lzw_encode_gif for its output, but a full decoder — it handles
    genuinely compressed streams (dictionary-referencing codes), not
    just the fixture's literal-only encoding."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {i: [i] for i in range(1 << min_code_size)}
    width, next_code = min_code_size + 1, eoi + 1
    acc = n_acc = pos = 0
    out: list = []
    prev = None
    while True:
        while n_acc < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << n_acc
            pos += 1
            n_acc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == clear:
            table = {i: [i] for i in range(1 << min_code_size)}
            width, next_code, prev = min_code_size + 1, eoi + 1, None
            continue
        if code == eoi:
            return out
        if code in table:
            entry = table[code]
        elif prev is not None and code == next_code:
            entry = prev + [prev[0]]  # the k-omega-k case
        else:
            raise ValueError(f"LZW code 0x{code:x} out of sequence")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def tiny_gif_bytes(
    frames: list[tuple[int, int, int, int]],
    screen: tuple[int, int] = (16, 16),
    seed: int = 0,
    pixels: list | None = None,
) -> bytes:
    """Hand-assembled multi-frame GIF89a (stdlib only): a 2-bit global
    palette and one solid-color image per (left, top, width, height)
    entry, pixel data really LZW-encoded (see _lzw_encode_gif) so the
    file is decodable, not just walkable. ``pixels`` optionally
    overrides the per-frame fills with explicit index lists (tests use
    it to exercise non-solid decode paths). The video-modality sibling
    of tiny_png_bytes / tiny_wav_bytes."""
    import struct

    if not frames:
        raise ValueError("at least one frame required")
    w, h = screen
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 4 entries (2 bits)
    out += struct.pack("<HHBBB", w, h, 0x91, 0, 0)
    for i in range(4):  # 4-entry RGB palette, deterministic
        out += bytes(((seed * 17 + i * 73) % 256 for _ in range(3)))
    for j, (left, top, fw, fh) in enumerate(frames):
        out += b"\x2C" + struct.pack("<HHHHB", left, top, fw, fh, 0)
        px = pixels[j] if pixels is not None else [(seed + j) % 4] * (fw * fh)
        data = _lzw_encode_gif(px, 2)
        out += b"\x02"  # LZW minimum code size
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out += bytes((len(chunk),)) + chunk
        out += b"\x00"  # block terminator
    out += b"\x3B"  # trailer
    return bytes(out)


GIF_FRAME_SCHEMA = (
    "media_id long, frame_id int, left int, top int, width int, "
    "height int, n_data_bytes long"
)


def gif_frame_index(df: DataFrame) -> DataFrame:
    """REAL video-container parse — not a stub: walks each payload's
    GIF block structure (header, logical screen descriptor, color
    tables, extension and image-descriptor blocks with their
    length-prefixed sub-blocks) and emits one row per frame with its
    geometry and compressed-data size — the index a frame-sampling
    pipeline reads before deciding which frames to decode. Pixel data
    is NOT decompressed (that is the point: the index pass is cheap).
    Malformed payloads raise with the media id. Row-exploding
    mapInPandas, same shape as frame_sample."""

    def parse_one(mid, content: bytes):
        import struct

        b = bytes(content)
        if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
            raise ValueError(f"media {mid}: not a GIF payload")
        try:
            return _walk(mid, b)
        except (IndexError, struct.error):
            raise ValueError(f"media {mid}: truncated GIF payload")

    def _walk(mid, b: bytes):
        import struct

        flags = b[10]
        off = 13
        if flags & 0x80:  # global color table
            off += 3 * (2 << (flags & 0x07))
        frames = []
        while off < len(b):
            tag = b[off]
            if tag == 0x3B:  # trailer
                return frames
            if tag == 0x21:  # extension: label + sub-blocks
                off += 2
                while b[off] != 0:
                    off += 1 + b[off]
                off += 1
            elif tag == 0x2C:  # image descriptor
                left, top, fw, fh, iflags = struct.unpack(
                    "<HHHHB", b[off + 1 : off + 10]
                )
                off += 10
                if iflags & 0x80:  # local color table
                    off += 3 * (2 << (iflags & 0x07))
                off += 1  # LZW minimum code size
                n_data = 0
                while b[off] != 0:
                    n_data += b[off]
                    off += 1 + b[off]
                off += 1
                frames.append((len(frames), left, top, fw, fh, n_data))
            else:
                raise ValueError(
                    f"media {mid}: unknown GIF block 0x{tag:02x}"
                )
        raise ValueError(f"media {mid}: missing GIF trailer")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fid, ls, ts, ws, hs, nb = [], [], [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for f in parse_one(mid, content):
                    ids.append(mid)
                    fid.append(f[0])
                    ls.append(f[1])
                    ts.append(f[2])
                    ws.append(f[3])
                    hs.append(f[4])
                    nb.append(f[5])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_id": pd.Series(fid, dtype="int32"),
                    "left": pd.Series(ls, dtype="int32"),
                    "top": pd.Series(ts, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_data_bytes": pd.Series(nb, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, schema=GIF_FRAME_SCHEMA)


GIF_PIXEL_SCHEMA = (
    "media_id long, frame_id int, width int, height int, "
    "n_pixels long, n_colors int, top_color int, mode_gray int, "
    "checksum long"
)


def _gif_frame_rasters(mid, content: bytes):
    """Shared container walk + LZW decode for the frame-level video
    operators: returns [(fw, fh, px_list, palette)] in frame order.
    Raster length is validated against the declared geometry; any
    desynchronization, unknown block, or truncation raises with the
    media id."""
    import struct

    b = bytes(content)
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        raise ValueError(f"media {mid}: not a GIF payload")
    try:
        flags = b[10]
        off = 13
        palette = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            palette = [b[off + 3 * i : off + 3 * i + 3] for i in range(n)]
            off += 3 * n
        frames = []
        while off < len(b):
            tag = b[off]
            if tag == 0x3B:
                return frames
            if tag == 0x21:
                off += 2
                while b[off] != 0:
                    off += 1 + b[off]
                off += 1
            elif tag == 0x2C:
                _, _, fw, fh, iflags = struct.unpack(
                    "<HHHHB", b[off + 1 : off + 10]
                )
                off += 10
                pal = palette
                if iflags & 0x80:
                    n = 2 << (iflags & 0x07)
                    pal = [b[off + 3 * i : off + 3 * i + 3] for i in range(n)]
                    off += 3 * n
                mcs = b[off]
                off += 1
                data = bytearray()
                while b[off] != 0:
                    data += b[off + 1 : off + 1 + b[off]]
                    off += 1 + b[off]
                off += 1
                try:
                    px = _lzw_decode_gif(bytes(data), mcs)
                except ValueError as e:
                    raise ValueError(f"media {mid} frame {len(frames)}: {e}")
                if len(px) != fw * fh:
                    raise ValueError(
                        f"media {mid} frame {len(frames)}: decoded "
                        f"{len(px)} pixels for a {fw}x{fh} raster"
                    )
                frames.append((fw, fh, px, pal))
            else:
                raise ValueError(
                    f"media {mid}: unknown GIF block 0x{tag:02x}"
                )
        raise ValueError(f"media {mid}: missing GIF trailer")
    except (IndexError, struct.error):
        raise ValueError(f"media {mid}: truncated GIF payload")


def gif_frame_pixels(df: DataFrame) -> DataFrame:
    """REAL video frame PIXEL decode — not a stub: walks the container
    exactly like gif_frame_index, then reassembles each frame's
    sub-block chain and runs a full GIF-LZW decode (_lzw_decode_gif:
    dictionary growth, k-omega-k, 12-bit cap) to recover the actual
    pixel index raster, plus the global palette for color features.
    Emits per frame: geometry, pixel count (validated against
    width*height — a desynchronized stream raises), distinct color
    count, the dominant palette index (ties to the smallest index),
    the dominant color's 8-bit gray value from the palette, and the
    raster checksum. This closes the frame_sample stub's gap for the
    one container format whose codec is pure stdlib; ffmpeg-class
    codecs remain out of scope by environment. Row-exploding
    mapInPandas; payloads never visit the driver."""

    def parse_one(mid, content: bytes):
        frames = []
        for fw, fh, px, pal in _gif_frame_rasters(mid, content):
            counts: dict = {}
            for p in px:
                counts[p] = counts.get(p, 0) + 1
            top = min(counts, key=lambda k: (-counts[k], k))
            gray = pal[top][0] if pal and top < len(pal) else -1
            frames.append(
                (
                    len(frames), fw, fh, len(px), len(counts),
                    top, gray, sum(px),
                )
            )
        return frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: list = [[] for _ in range(9)]
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for f in parse_one(mid, content):
                    cols[0].append(mid)
                    for k in range(8):
                        cols[k + 1].append(f[k])
            yield pd.DataFrame(
                {
                    "media_id": cols[0],
                    "frame_id": pd.Series(cols[1], dtype="int32"),
                    "width": pd.Series(cols[2], dtype="int32"),
                    "height": pd.Series(cols[3], dtype="int32"),
                    "n_pixels": pd.Series(cols[4], dtype="int64"),
                    "n_colors": pd.Series(cols[5], dtype="int32"),
                    "top_color": pd.Series(cols[6], dtype="int32"),
                    "mode_gray": pd.Series(cols[7], dtype="int32"),
                    "checksum": pd.Series(cols[8], dtype="int64"),
                }
            )

    return df.mapInPandas(batches, schema=GIF_PIXEL_SCHEMA)


def synthesize_gif_corpus(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic GIF corpus from an id column: frame count and
    geometry arithmetic in the id (cf. synthesize_wav_corpus), so the
    q172 oracle can state the expected frame index relationally and
    the gate proves gif_frame_index recovers it from real binary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [
                        tiny_gif_bytes(
                            [
                                (
                                    j % 5,
                                    (int(i) + j) % 7,
                                    1 + (int(i) + j) % 8,
                                    1 + j % 6,
                                )
                                for j in range(1 + int(i) % 4)
                            ],
                            seed=int(i),
                        )
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, content binary"
    )


WAV_META_SCHEMA = (
    "media_id long, channels int, sample_rate int, bits int, "
    "n_frames long, duration_ms long"
)


def synthesize_wav_corpus(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic WAV corpus from an id column (Arrow-batched):
    params derive arithmetically from the id, so an external oracle
    can state the expected metadata without parsing any binary —
    the q171 roundtrip then proves decode_wav_meta recovers exactly
    what was synthesized. Returns (media_id, content binary)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [
                        tiny_wav_bytes(
                            n_frames=20 + int(i) % 40,
                            sample_rate=8000 * (1 + int(i) % 3),
                            channels=1 + int(i) % 2,
                            bits=8 if int(i) % 5 == 0 else 16,
                            seed=int(i),
                        )
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, content binary"
    )


def decode_wav_meta(df: DataFrame) -> DataFrame:
    """REAL audio metadata decode — not a stub: walks the RIFF chunk
    list of each payload (stdlib struct, present in every executor
    Python) and emits the PCM params: channels, sample rate, bit
    depth, frame count, duration. Malformed payloads raise with the
    media id — silently emitting zeros would poison downstream
    duration accounting. Arrow-batched mapInPandas; payloads never
    visit the driver."""

    def parse_one(mid, content: bytes):
        import struct

        b = bytes(content)
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError(f"media {mid}: not a RIFF/WAVE payload")
        off, fmt, data_len = 12, None, None
        while off + 8 <= len(b):
            tag = b[off : off + 4]
            (size,) = struct.unpack("<I", b[off + 4 : off + 8])
            if tag == b"fmt ":
                try:
                    fmt = struct.unpack("<HHIIHH", b[off + 8 : off + 24])
                except struct.error:
                    raise ValueError(
                        f"media {mid}: truncated WAVE fmt chunk"
                    )
            elif tag == b"data":
                data_len = size
            off += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data_len is None:
            raise ValueError(f"media {mid}: missing fmt/data chunk")
        _, channels, rate, _, block_align, bits = fmt
        n_frames = data_len // block_align
        return (
            channels,
            rate,
            bits,
            n_frames,
            (n_frames * 1000) // rate,
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [
                parse_one(mid, content)
                for mid, content in zip(pdf["media_id"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "channels": pd.Series(
                        [p[0] for p in parsed], dtype="int32"
                    ),
                    "sample_rate": pd.Series(
                        [p[1] for p in parsed], dtype="int32"
                    ),
                    "bits": pd.Series(
                        [p[2] for p in parsed], dtype="int32"
                    ),
                    "n_frames": pd.Series(
                        [p[3] for p in parsed], dtype="int64"
                    ),
                    "duration_ms": pd.Series(
                        [p[4] for p in parsed], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(batches, schema=WAV_META_SCHEMA)


def _parse_wav_pcm(mid, content: bytes):
    """RIFF walk + PCM sample decode (stdlib struct): returns
    (channels, rate, bits, samples) where samples are mono (channels
    averaged per sample-frame), 8-bit values centered (-128..127) and
    16-bit values signed. Malformed payloads raise with the media
    id."""
    import struct

    b = bytes(content)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"media {mid}: not a RIFF/WAVE payload")
    off, fmt, data = 12, None, None
    while off + 8 <= len(b):
        tag = b[off : off + 4]
        (size,) = struct.unpack("<I", b[off + 4 : off + 8])
        if tag == b"fmt ":
            try:
                fmt = struct.unpack("<HHIIHH", b[off + 8 : off + 24])
            except struct.error:
                raise ValueError(f"media {mid}: truncated WAVE fmt chunk")
        elif tag == b"data":
            data = b[off + 8 : off + 8 + size]
            if len(data) != size:
                raise ValueError(f"media {mid}: truncated WAVE data chunk")
        off += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError(f"media {mid}: missing fmt/data chunk")
    _, channels, rate, _, _, bits = fmt
    if bits == 8:
        vals = [x - 128 for x in data]  # 8-bit PCM is unsigned
    elif bits == 16:
        n = len(data) // 2
        vals = list(struct.unpack(f"<{n}h", data[: n * 2]))
    else:
        raise ValueError(f"media {mid}: unsupported PCM bit depth {bits}")
    if channels > 1:
        nfr = len(vals) // channels
        vals = [
            sum(vals[f * channels : (f + 1) * channels]) / channels
            for f in range(nfr)
        ]
    return channels, rate, bits, vals


def synthesize_speech_wav_corpus(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic 'speech-like' WAV corpus from an id column:
    alternating silent / loud spans whose geometry and amplitude
    derive arithmetically from the id — span length = 4 * (2 + id%4)
    samples, span count = 4 + id%3, loudness a ±A square wave with
    A = 2000 + (id%7) * 1000 (so every analysis window inside a loud
    span has RMS exactly A) — letting the q174 oracle state the
    expected segments without parsing any binary. 16-bit mono PCM at
    8 kHz."""
    import struct

    def synth_one(i: int) -> bytes:
        m = 2 + i % 4
        span = 4 * m
        n_spans = 4 + i % 3
        amp = 2000 + (i % 7) * 1000
        frames = bytearray()
        for j in range(span * n_spans):
            loud = (j // span) % 2 == 1
            v = (amp if j % 2 == 0 else -amp) if loud else 0
            frames += struct.pack("<h", v)
        data = bytes(frames)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        return (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [synth_one(int(i)) for i in ids],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, content binary"
    )


SEGMENT_SCHEMA = (
    "media_id long, seg_id int, start_sample long, n_samples long, "
    "rms double"
)


def segment_wav_energy(
    df: DataFrame, frame_samples: int = 4, threshold: float = 1.0
) -> DataFrame:
    """REAL audio segmentation — not a stub: decodes the actual PCM
    samples of each payload (stdlib struct; 8/16-bit, multi-channel
    mixed down), computes RMS over fixed non-overlapping analysis
    windows of ``frame_samples`` sample-frames, and emits one row per
    maximal run of windows with RMS >= ``threshold`` — the
    energy-based voice-activity pass every transcription pipeline
    runs before handing segments to an ASR model (the model itself is
    the only absent piece; segment boundaries and energies are
    computed for real). A trailing partial window is ignored
    (deterministic; documented contract). Malformed payloads raise
    with the media id. Map-only mapInPandas; payloads never visit the
    driver."""
    import math

    if frame_samples <= 0:
        raise ValueError("frame_samples must be positive")

    def segs_one(mid, content):
        _, _, _, vals = _parse_wav_pcm(mid, content)
        out, cur = [], None  # cur = [start_window, n_windows, rms_sum]
        for wdx in range(len(vals) // frame_samples):
            w = vals[wdx * frame_samples : (wdx + 1) * frame_samples]
            rms = math.sqrt(sum(v * v for v in w) / frame_samples)
            if rms >= threshold:
                if cur is None:
                    cur = [wdx, 0, 0.0]
                cur[1] += 1
                cur[2] += rms
            elif cur is not None:
                out.append(cur)
                cur = None
        if cur is not None:
            out.append(cur)
        return [
            (
                i,
                s[0] * frame_samples,
                s[1] * frame_samples,
                s[2] / s[1],
            )
            for i, s in enumerate(out)
        ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, sid, ss, ns, rmss = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for seg in segs_one(mid, content):
                    ids.append(mid)
                    sid.append(seg[0])
                    ss.append(seg[1])
                    ns.append(seg[2])
                    rmss.append(seg[3])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "seg_id": pd.Series(sid, dtype="int32"),
                    "start_sample": pd.Series(ss, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return df.mapInPandas(batches, schema=SEGMENT_SCHEMA)


SPECTRAL_SCHEMA = "media_id long, bin int, magnitude double"


def synthesize_spectral_corpus(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 64
) -> DataFrame:
    """Deterministic mono 16-bit WAV corpus for the spectral probe:
    fixed frame count, samples the same id-derived sawtooth
    tiny_wav_bytes emits, so an external oracle can restate every
    sample as ((id*7 + i*31) % 251 - 125) * 200 without parsing
    binary. Returns (media_id, content binary)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [
                        tiny_wav_bytes(
                            n_frames=n_frames,
                            sample_rate=8000,
                            channels=1,
                            bits=16,
                            seed=int(i),
                        )
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, content binary"
    )


def wav_spectral_probe(
    df: DataFrame,
    bins: tuple[int, ...] = (1, 3, 5, 7),
    n_samples: int = 64,
) -> DataFrame:
    """REAL spectral feature extraction — not a stub: decodes each
    payload's PCM samples (the same RIFF walk as the segmenter) and
    evaluates the DFT magnitude at the requested ``bins`` over the
    first ``n_samples`` mono samples:

        mag_k = sqrt( (sum_i x_i cos(2 pi k i / N))^2
                    + (sum_i x_i sin(2 pi k i / N))^2 ) / N

    — the tone-probe / frequency-feature pass of an audio pipeline
    (a full FFT frontend differs only in which bins it keeps). The
    direct form (not Goertzel's recurrence) is used deliberately: its
    float evaluation order matches the relational oracle term for
    term. Clips shorter than ``n_samples`` raise with the media id.
    Map-only mapInPandas; payloads never visit the driver."""
    import math

    if n_samples <= 0:
        raise ValueError("n_samples must be positive")
    if not bins:
        raise ValueError("bins must be non-empty")

    def probe_one(mid, content):
        _, _, _, vals = _parse_wav_pcm(mid, content)
        if len(vals) < n_samples:
            raise ValueError(
                f"media {mid}: clip has {len(vals)} samples, "
                f"probe needs {n_samples}"
            )
        x = vals[:n_samples]
        out = []
        for k in bins:
            c = sum(
                v * math.cos(2 * math.pi * k * i / n_samples)
                for i, v in enumerate(x)
            )
            s = sum(
                v * math.sin(2 * math.pi * k * i / n_samples)
                for i, v in enumerate(x)
            )
            out.append((k, math.sqrt(c * c + s * s) / n_samples))
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ks, mags = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for k, mag in probe_one(mid, content):
                    ids.append(mid)
                    ks.append(k)
                    mags.append(mag)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "bin": pd.Series(ks, dtype="int32"),
                    "magnitude": pd.Series(mags, dtype="float64"),
                }
            )

    return df.mapInPandas(batches, schema=SPECTRAL_SCHEMA)


KEYFRAME_SCHEMA = (
    "media_id long, frame_id int, mean_gray double, delta double, "
    "is_keyframe boolean"
)


def gif_keyframes(df: DataFrame, threshold: float = 40.0) -> DataFrame:
    """REAL shot/keyframe detection over decoded video frames — the
    frame-sampling pass of a video training pipeline: each frame's
    mean 8-bit luminance is computed from the ACTUAL decoded raster
    (palette red channel as gray, consistent with gif_frame_pixels),
    the absolute delta to the previous frame is taken, and a frame is
    a keyframe iff it is the first frame or its delta >= ``threshold``
    (the classic luma-difference shot detector; a real pipeline feeds
    only keyframes to the expensive vision encoder). Frames without a
    palette raise with the media id. The whole per-media sequence
    (decode, deltas, flags) happens inside ONE map-only mapInPandas —
    no window, no shuffle, payloads never visit the driver."""
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0, got {threshold}")

    def frames_one(mid, content):
        out, prev = [], None
        for j, (fw, fh, px, pal) in enumerate(
            _gif_frame_rasters(mid, content)
        ):
            if pal is None:
                raise ValueError(
                    f"media {mid} frame {j}: no palette for luminance"
                )
            mean = sum(pal[p][0] for p in px) / len(px)
            delta = 0.0 if prev is None else abs(mean - prev)
            out.append((j, mean, delta, prev is None or delta >= threshold))
            prev = mean
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fids, means, deltas, keys = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for j, mean, delta, kf in frames_one(mid, content):
                    ids.append(mid)
                    fids.append(j)
                    means.append(mean)
                    deltas.append(delta)
                    keys.append(bool(kf))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_id": pd.Series(fids, dtype="int32"),
                    "mean_gray": pd.Series(means, dtype="float64"),
                    "delta": pd.Series(deltas, dtype="float64"),
                    "is_keyframe": pd.Series(keys, dtype="bool"),
                }
            )

    return df.mapInPandas(batches, schema=KEYFRAME_SCHEMA)


# ---------------------------------------------------------------------------
# TAR archive shards — the container tier of web-scale ingestion
# (WebDataset-style training shards ship exactly like this: millions of
# small members inside large sequential archives). Structure walk +
# member extraction run inside Arrow batches; payloads never visit the
# driver.
# ---------------------------------------------------------------------------

TAR_MEMBER_SCHEMA = (
    "media_id long, member_idx int, name string, size long, "
    "content_md5 string"
)


def synthesize_tar_corpus(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic ustar archives per id: 1 + id%4 text members;
    member i is named m{id}_{i}.txt and holds 10 + (id*7 + i*13)%50
    repeats of the letter chr(97 + (id+i)%26). Fixed mtime/uid/gid so
    archive bytes are bit-stable. Map-only mapInPandas."""

    def batches(it):
        import hashlib  # noqa: F401  (parity with decode imports)
        import io
        import tarfile

        import pandas as pd

        for pdf in it:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as tf:
                    for i in range(1 + mid % 4):
                        size = 10 + (mid * 7 + i * 13) % 50
                        body = chr(97 + (mid + i) % 26).encode() * size
                        info = tarfile.TarInfo(name=f"m{mid}_{i}.txt")
                        info.size = size
                        info.mtime = 0
                        info.uid = info.gid = 0
                        tf.addfile(info, io.BytesIO(body))
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


def synthesize_webdataset_shards(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic WebDataset shards — the de-facto format
    multimodal training corpora ship in: one ustar archive per id
    holding 2 + id%3 SAMPLES, each sample a pair of same-stem members
    ``{key}.png`` (a tiny real PNG whose pixel matrix derives from the
    sample seed s = id*5 + k: w = 3 + s%6, h = 2 + s%5, pixel =
    (s*31 + r*17 + c*7) % 256 — the q173 arithmetic re-seeded) and
    ``{key}.json`` ({"caption": "img {id} {k}", "label": (id+k)%10});
    keys are ``{id:06d}{k}``, members pair-adjacent as the format
    requires. Fixed mtime/uid/gid for bit-stable archives. Map-only
    mapInPandas."""

    def batches(it):
        import io
        import json as _json
        import tarfile

        import pandas as pd

        for pdf in it:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as tf:
                    for k in range(2 + mid % 3):
                        s = mid * 5 + k
                        w, h = 3 + s % 6, 2 + s % 5
                        rows = [
                            [(s * 31 + r * 17 + c * 7) % 256
                             for c in range(w)]
                            for r in range(h)
                        ]
                        png = tiny_png_bytes(rows)
                        meta = _json.dumps(
                            {
                                "caption": f"img {mid} {k}",
                                "label": (mid + k) % 10,
                            },
                            sort_keys=True,
                        ).encode()
                        key = f"{mid:06d}{k}"
                        for name, body in (
                            (f"{key}.png", png),
                            (f"{key}.json", meta),
                        ):
                            info = tarfile.TarInfo(name=name)
                            info.size = len(body)
                            info.mtime = 0
                            info.uid = info.gid = 0
                            tf.addfile(info, io.BytesIO(body))
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


def synthesize_webdataset_mixed_shards(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Real-corpus sibling of :func:`synthesize_webdataset_shards`:
    samples mix member formats the way foreign shards do. Per sample
    seed s = id*5 + k: EVEN s carries ``{key}.png`` (the same pixel
    arithmetic as the plain shards), ODD s carries ``{key}.jpg`` — a
    baseline JPEG of 8x8-constant blocks, grid (1 + s%3) x (1 + s%2),
    block value (s*31 + bx*17 + by*7) % 256 (integral DC, unit
    quantization: decode is exact). Metadata: s % 3 == 0 ships as
    separate ``{key}.txt`` (caption) + ``{key}.cls`` (label) members,
    else as ``{key}.json``. Captions/labels are the plain shards'
    ("img {id} {k}", (id+k) % 10). Fixed mtime/uid/gid for bit-stable
    archives. Map-only mapInPandas."""
    from .jpeg import _const_block, tiny_jpeg_bytes

    def batches(it):
        import io
        import json as _json
        import tarfile

        import pandas as pd

        for pdf in it:
            payloads = []
            for mid in pdf[id_col]:
                mid = int(mid)
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as tf:
                    for k in range(2 + mid % 3):
                        s = mid * 5 + k
                        if s % 2 == 0:
                            w, h = 3 + s % 6, 2 + s % 5
                            rows = [
                                [(s * 31 + r * 17 + c * 7) % 256
                                 for c in range(w)]
                                for r in range(h)
                            ]
                            img = ("png", tiny_png_bytes(rows))
                        else:
                            bw_, bh_ = 1 + s % 3, 1 + s % 2
                            grid = [
                                [
                                    _const_block(
                                        (s * 31 + bx * 17 + by * 7) % 256
                                    )
                                    for bx in range(bw_)
                                ]
                                for by in range(bh_)
                            ]
                            img = (
                                "jpg",
                                tiny_jpeg_bytes(8 * bw_, 8 * bh_, grid),
                            )
                        caption = f"img {mid} {k}"
                        label = (mid + k) % 10
                        if s % 3 == 0:
                            metas = [
                                ("txt", caption.encode()),
                                ("cls", str(label).encode()),
                            ]
                        else:
                            metas = [
                                (
                                    "json",
                                    _json.dumps(
                                        {"caption": caption, "label": label},
                                        sort_keys=True,
                                    ).encode(),
                                )
                            ]
                        key = f"{mid:06d}{k}"
                        for ext, body in [img] + metas:
                            info = tarfile.TarInfo(name=f"{key}.{ext}")
                            info.size = len(body)
                            info.mtime = 0
                            info.uid = info.gid = 0
                            tf.addfile(info, io.BytesIO(body))
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


def decode_webdataset_samples(df: DataFrame) -> DataFrame:
    """Walk WebDataset shards into a SAMPLE relation: members group by
    key stem (the name before the first '.'), and each stem's
    contiguous member group must resolve to exactly one sample — one
    image member (``.png`` REALLY decoded by :func:`_parse_png`, or
    ``.jpg`` by the full baseline decoder in
    :func:`~delta_lake_spark.operators.jpeg._parse_jpeg`), a caption
    (``.json``'s ``caption`` field, else a ``.txt`` member), and a
    label (``.json``'s ``label`` field, else an integer ``.cls``
    member) — the real-corpus member mix. The format contract stays
    loud: an unknown extension, a duplicate same-stem same-extension
    member, a stem split across non-contiguous runs, a sample missing
    its image or metadata, or two image members all raise with the
    media id. This is the shard-to-training-rows step of every
    multimodal loader, as a relation instead of an iterator. Map-only
    mapInPandas; payloads never visit the driver. Returns (media_id,
    sample_key, width, height, mean_luma 1e-9-rounded, caption,
    label)."""

    def batches(it):
        import io
        import json as _json
        import tarfile

        import pandas as pd

        from .jpeg import _parse_jpeg

        cols = [
            "media_id", "sample_key", "width", "height", "mean_luma",
            "caption", "label",
        ]

        def finalize(mid, key, pending):
            imgs = [e for e in ("png", "jpg") if e in pending]
            if len(imgs) != 1:
                raise ValueError(
                    f"sample {key!r} needs exactly one image member,"
                    f" got {imgs or 'none'}"
                )
            if imgs[0] == "png":
                _, w, h, _, luma = _parse_png(mid, pending["png"])
            else:
                w, h, mode, planes = _parse_jpeg(mid, pending["jpg"])
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
                luma = num / den
            meta = (
                _json.loads(pending["json"]) if "json" in pending else {}
            )
            if "caption" in meta:
                caption = meta["caption"]
            elif "txt" in pending:
                caption = pending["txt"].decode("utf-8")
            else:
                raise ValueError(
                    f"sample {key!r} missing its caption"
                    " (.json caption or .txt)"
                )
            if "label" in meta:
                label = int(meta["label"])
            elif "cls" in pending:
                label = int(pending["cls"].decode("ascii").strip())
            else:
                raise ValueError(
                    f"sample {key!r} missing its label"
                    " (.json label or .cls)"
                )
            return (key, w, h, round(luma, 9), caption, label)

        def walk(mid, payload: bytes):
            out = []
            seen_stems = set()
            with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
                pending_key = None
                pending = {}
                for info in tf:
                    stem, dot, ext = info.name.partition(".")
                    if ext not in ("png", "jpg", "json", "txt", "cls"):
                        raise ValueError(
                            f"unknown member extension {info.name!r}"
                        )
                    if pending_key is None:
                        pending_key = stem
                    elif stem != pending_key:
                        out.append(finalize(mid, pending_key, pending))
                        seen_stems.add(pending_key)
                        pending_key = stem
                        pending = {}
                    if stem in seen_stems:
                        raise ValueError(
                            f"interleaved sample members at {info.name!r}:"
                            f" stem {stem!r} already finalized"
                        )
                    if ext in pending:
                        raise ValueError(
                            f"duplicate member {info.name!r}: extension"
                            f" .{ext} already present for stem {stem!r}"
                        )
                    pending[ext] = tf.extractfile(info).read()
                if pending:
                    out.append(finalize(mid, pending_key, pending))
            return out

        for pdf in it:
            rows = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples = walk(int(mid), bytes(payload))
                except (ValueError, KeyError, tarfile.TarError) as e:
                    raise ValueError(
                        "malformed webdataset shard for "
                        f"media_id={int(mid)}: {e}"
                    ) from e
                for srow in samples:
                    rows["media_id"].append(int(mid))
                    for kc, v in zip(cols[1:], srow):
                        rows[kc].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        batches,
        schema="media_id long, sample_key string, width int, "
        "height int, mean_luma double, caption string, label int",
    )


def decode_tar_members(df: DataFrame) -> DataFrame:
    """Walk every archive's member table and hash each member's
    content — one output row per member: (media_id, member_idx, name,
    size, content_md5). Malformed archives raise with the media id.
    Map-only mapInPandas; the member fan-out happens executor-side."""

    def batches(it):
        import hashlib
        import io
        import tarfile

        import pandas as pd

        cols = ["media_id", "member_idx", "name", "size", "content_md5"]
        for pdf in it:
            rows = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(payload)), mode="r"
                    ) as tf:
                        for i, info in enumerate(tf.getmembers()):
                            body = tf.extractfile(info).read()
                            rows["media_id"].append(int(mid))
                            rows["member_idx"].append(i)
                            rows["name"].append(info.name)
                            rows["size"].append(int(info.size))
                            rows["content_md5"].append(
                                hashlib.md5(body).hexdigest()
                            )
                except tarfile.TarError as e:
                    raise ValueError(
                        f"malformed tar payload for media_id={int(mid)}: {e}"
                    ) from e
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=TAR_MEMBER_SCHEMA)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF container walk (the video-shard ingestion tier).
# Video at corpus scale arrives as MP4, not GIF: the metadata a pipeline
# needs (per-track codec, timescale, duration, sample count, keyframe
# index) lives entirely in the moov box tree — no codec decode required.
# Synthesis and walk are pure stdlib struct packing/unpacking, mirroring
# the TAR tier (synthesize_tar_corpus / decode_tar_members) so both
# directions are testable in this container-less environment while the
# Spark-side plumbing (schemas, map-only mapInPandas, malformed raises)
# is the real production shape.
# ---------------------------------------------------------------------------

MP4_TRACK_SCHEMA = (
    "media_id long, track_idx int, track_id long, handler string, "
    "codec string, timescale long, n_samples long, duration long, "
    "sample_bytes long, n_keyframes long, first_keyframe long, "
    "last_keyframe long"
)

_MP4_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl"}


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4_full_box(btype: bytes, version: int, payload: bytes) -> bytes:
    import struct

    return _mp4_box(btype, struct.pack(">I", version << 24) + payload)


def _mp4_track_params(mid: int, i: int) -> dict:
    """Deterministic per-(media, track) parameters shared by synthesis,
    the walk's expectations, and the SQL oracle (q267)."""
    is_video = (mid + i) % 2 == 0
    k = 1 + (mid + i) % 5
    n_samples = 5 + (mid * 3 + i * 7) % 20
    return {
        "handler": "vide" if is_video else "soun",
        "codec": "avc1" if is_video else "mp4a",
        "timescale": 600 + 100 * ((mid + i) % 3),
        "n_samples": n_samples,
        "delta": 100 + (mid + i) % 50,
        "sizes": [20 + (mid + i + j) % 30 for j in range(n_samples)],
        "key_step": k if is_video else None,
    }


def synthesize_mp4_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic minimal-but-valid ISO-BMFF files per id: ftyp +
    mdat + moov with 1 + id%3 tracks (alternating avc1 video / mp4a
    audio sample entries), full stbl sample tables (stsd/stts/stsz/
    stsc/stco) and, for video tracks, an stss sync-sample (keyframe)
    table marking every k-th sample. All fields derive from
    _mp4_track_params so the walk and the SQL oracle can state the
    same arithmetic. Map-only mapInPandas; pure stdlib struct."""

    def batches(it):
        import struct

        import pandas as pd

        def build(mid: int) -> bytes:
            n_tracks = 1 + mid % 3
            params = [_mp4_track_params(mid, i) for i in range(n_tracks)]
            ftyp = _mp4_box(
                b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42"
            )
            bodies = [
                bytes(
                    (mid + i + j) % 256
                    for j, sz in enumerate(p["sizes"])
                    for _ in range(sz)
                )
                for i, p in enumerate(params)
            ]
            mdat = _mp4_box(b"mdat", b"".join(bodies))
            # chunk offsets are absolute file offsets into mdat's body
            base = len(ftyp) + 8
            offsets, off = [], base
            for body in bodies:
                offsets.append(off)
                off += len(body)
            traks = []
            movie_ts = 1000
            max_dur = 0
            for i, p in enumerate(params):
                dur = p["n_samples"] * p["delta"]
                movie_dur = dur * movie_ts // p["timescale"]
                max_dur = max(max_dur, movie_dur)
                tkhd = _mp4_full_box(
                    b"tkhd",
                    0,
                    struct.pack(
                        ">IIIII", 0, 0, i + 1, 0, movie_dur
                    )
                    + b"\x00" * 60,
                )
                mdhd = _mp4_full_box(
                    b"mdhd",
                    0,
                    struct.pack(">IIIIIHH", 0, 0, p["timescale"], dur, 0, 0, 0)[
                        :20
                    ],
                )
                hdlr = _mp4_full_box(
                    b"hdlr",
                    0,
                    struct.pack(">I", 0)
                    + p["handler"].encode()
                    + b"\x00" * 12
                    + b"\x00",
                )
                entry = struct.pack(
                    ">I4s", 16, p["codec"].encode()
                ) + b"\x00" * 8
                stsd = _mp4_full_box(
                    b"stsd", 0, struct.pack(">I", 1) + entry
                )
                stts = _mp4_full_box(
                    b"stts",
                    0,
                    struct.pack(">III", 1, p["n_samples"], p["delta"]),
                )
                stsz = _mp4_full_box(
                    b"stsz",
                    0,
                    struct.pack(">II", 0, p["n_samples"])
                    + b"".join(struct.pack(">I", s) for s in p["sizes"]),
                )
                stsc = _mp4_full_box(
                    b"stsc",
                    0,
                    struct.pack(">IIII", 1, 1, p["n_samples"], 1),
                )
                stco = _mp4_full_box(
                    b"stco", 0, struct.pack(">II", 1, offsets[i])
                )
                stbl_children = [stsd, stts, stsz, stsc, stco]
                if p["key_step"] is not None:
                    keys = list(
                        range(1, p["n_samples"] + 1, p["key_step"])
                    )
                    stbl_children.append(
                        _mp4_full_box(
                            b"stss",
                            0,
                            struct.pack(">I", len(keys))
                            + b"".join(
                                struct.pack(">I", s) for s in keys
                            ),
                        )
                    )
                stbl = _mp4_box(b"stbl", b"".join(stbl_children))
                minf = _mp4_box(b"minf", stbl)
                mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
                traks.append(_mp4_box(b"trak", tkhd + mdia))
            mvhd = _mp4_full_box(
                b"mvhd",
                0,
                struct.pack(">IIII", 0, 0, movie_ts, max_dur)
                + b"\x00" * 80,
            )
            moov = _mp4_box(b"moov", mvhd + b"".join(traks))
            return ftyp + mdat + moov

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": [build(int(m)) for m in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


def decode_mp4_tracks(df: DataFrame) -> DataFrame:
    """Walk each payload's ISO-BMFF box tree (ftyp/moov/trak/mdia/minf/
    stbl) and emit one row per track with the metadata a video-corpus
    pipeline partitions and filters on: handler + sample-entry codec
    fourcc, media timescale, sample count and duration from stts,
    total sample bytes from stsz, and the stss keyframe index (count,
    first, last; NULL for tracks without a sync table, e.g. audio).
    stco chunk offsets are validated to land inside the mdat box —
    a truncated or spliced file raises with its media id, as do
    unterminated/oversized boxes. Map-only mapInPandas; payloads
    never visit the driver; no codec decode."""

    def batches(it):
        import struct

        import pandas as pd

        def children(buf, start, end):
            off = start
            while off + 8 <= end:
                size, btype = struct.unpack_from(">I4s", buf, off)
                header = 8
                if size == 1:
                    (size,) = struct.unpack_from(">Q", buf, off + 8)
                    header = 16
                elif size == 0:
                    size = end - off
                if size < header or off + size > end:
                    raise ValueError(
                        f"box {btype!r} at {off} has bad size {size}"
                    )
                yield btype.decode("latin-1"), off + header, off + size
                off += size
            if off != end:
                raise ValueError(f"trailing bytes after {off} (end {end})")

        def find(buf, start, end, btype):
            for t, s, e in children(buf, start, end):
                if t == btype:
                    return s, e
            return None

        def walk(buf):
            mdat_span = None
            moov = None
            for t, s, e in children(buf, 0, len(buf)):
                if t == "mdat":
                    mdat_span = (s, e)
                elif t == "moov":
                    moov = (s, e)
            if moov is None:
                raise ValueError("no moov box")
            out = []
            idx = 0
            for t, s, e in children(buf, *moov):
                if t != "trak":
                    continue
                tkhd = find(buf, s, e, "tkhd")
                if tkhd is None:
                    raise ValueError("trak without tkhd")
                track_id = struct.unpack_from(">I", buf, tkhd[0] + 12)[0]
                mdia = find(buf, s, e, "mdia")
                mdhd = find(buf, *mdia, "mdhd")
                timescale = struct.unpack_from(">I", buf, mdhd[0] + 12)[0]
                hdlr = find(buf, *mdia, "hdlr")
                handler = buf[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
                stbl = find(buf, *find(buf, *mdia, "minf"), "stbl")
                stsd = find(buf, *stbl, "stsd")
                codec = buf[stsd[0] + 12 : stsd[0] + 16].decode("latin-1")
                stts = find(buf, *stbl, "stts")
                (n_ent,) = struct.unpack_from(">I", buf, stts[0] + 4)
                n_samples = duration = 0
                for j in range(n_ent):
                    c, d = struct.unpack_from(
                        ">II", buf, stts[0] + 8 + 8 * j
                    )
                    n_samples += c
                    duration += c * d
                stsz = find(buf, *stbl, "stsz")
                fixed, count = struct.unpack_from(">II", buf, stsz[0] + 4)
                if fixed:
                    sample_bytes = fixed * count
                else:
                    sample_bytes = sum(
                        struct.unpack_from(
                            f">{count}I", buf, stsz[0] + 12
                        )
                    )
                stco = find(buf, *stbl, "stco")
                (n_chunks,) = struct.unpack_from(">I", buf, stco[0] + 4)
                for j in range(n_chunks):
                    (coff,) = struct.unpack_from(
                        ">I", buf, stco[0] + 8 + 4 * j
                    )
                    if mdat_span is None or not (
                        mdat_span[0] <= coff <= mdat_span[1]
                    ):
                        raise ValueError(
                            f"stco offset {coff} outside mdat"
                        )
                stss = find(buf, *stbl, "stss")
                if stss is not None:
                    (nk,) = struct.unpack_from(">I", buf, stss[0] + 4)
                    keys = struct.unpack_from(
                        f">{nk}I", buf, stss[0] + 8
                    )
                    kf = (nk, keys[0], keys[-1]) if nk else (0, None, None)
                else:
                    kf = (None, None, None)
                out.append(
                    (
                        idx,
                        track_id,
                        handler,
                        codec,
                        timescale,
                        n_samples,
                        duration,
                        sample_bytes,
                    )
                    + kf
                )
                idx += 1
            return out

        cols = [
            "media_id", "track_idx", "track_id", "handler", "codec",
            "timescale", "n_samples", "duration", "sample_bytes",
            "n_keyframes", "first_keyframe", "last_keyframe",
        ]
        for pdf in it:
            rows = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    tracks = walk(bytes(payload))
                except (ValueError, struct.error) as e:
                    raise ValueError(
                        f"malformed mp4 payload for media_id={int(mid)}: {e}"
                    ) from e
                for t in tracks:
                    rows["media_id"].append(int(mid))
                    for k, v in zip(cols[1:], t):
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=MP4_TRACK_SCHEMA)


def keyframe_sampling_plan(tracks: DataFrame, n_slots: int = 4) -> DataFrame:
    """Uniform keyframe sampling plan over decode_mp4_tracks output —
    the pre-step of every frame-sampling pipeline: for each VIDEO
    track pick up to ``n_slots`` keyframes spread evenly across its
    stss sync-sample list (slot j maps to keyframe ordinal
    floor(j*(nk-1)/(m-1)), strictly increasing whenever the list is
    long enough, so slots never collide), and report the exact sample
    number plus its media-timescale presentation offset in
    MICROSECONDS (all integral division — the walk's duration is
    n_samples * delta by construction, so delta recovers exactly).
    A fetcher/decoder then seeks exactly these samples; nothing else
    in the mdat is ever read. Map-only: one bounded explode of
    <= n_slots rows per video track; audio tracks (no sync table)
    drop out.

    Returns (media_id, track_idx, slot, keyframe_ordinal,
    sample_number, time_offset_micros)."""
    if n_slots < 1:
        raise ValueError(f"n_slots must be >= 1, got {n_slots}")
    v = tracks.filter(
        F.col("n_keyframes").isNotNull() & (F.col("n_keyframes") > 0)
    ).select(
        "media_id",
        "track_idx",
        "timescale",
        "n_samples",
        "duration",
        "n_keyframes",
        "first_keyframe",
        # keyframe stride from the walk's index summary (exact: the
        # stss list is arithmetic by construction of the sync table;
        # integral DIV, never a float division)
        F.expr(
            "CAST(IF(n_keyframes > 1,"
            " (last_keyframe - first_keyframe) DIV (n_keyframes - 1),"
            " 0) AS BIGINT)"
        ).alias("__k"),
        F.least(F.lit(int(n_slots)), F.col("n_keyframes")).alias("__m"),
    )
    slots = v.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.col("__m") - 1)).alias("slot"),
    )
    return (
        slots.select(
            "media_id",
            "track_idx",
            F.col("slot").cast("int").alias("slot"),
            F.expr(
                "CAST(IF(__m > 1, (slot * (n_keyframes - 1)) DIV (__m - 1),"
                " 0) AS BIGINT)"
            ).alias("keyframe_ordinal"),
            "first_keyframe",
            "__k",
            "timescale",
            "n_samples",
            "duration",
        )
        .select(
            "media_id",
            "track_idx",
            "slot",
            "keyframe_ordinal",
            (
                F.col("first_keyframe")
                + F.col("__k") * F.col("keyframe_ordinal")
            )
            .cast("long")
            .alias("sample_number"),
            "timescale",
            "n_samples",
            "duration",
        )
        .select(
            "media_id",
            "track_idx",
            "slot",
            "keyframe_ordinal",
            "sample_number",
            F.expr(
                "CAST(((sample_number - 1) * (duration DIV n_samples)"
                " * 1000000) DIV timescale AS BIGINT)"
            ).alias("time_offset_micros"),
        )
    )


# ---------------------------------------------------------------------------
# WARC container walk (the web-crawl ingestion tier). CommonCrawl-style
# corpora arrive as WARC files — the records' headers (type, target
# URI, content length) plus payload digests are what the ingestion
# stage extracts before any text processing. Same pure-stdlib
# synth/walk pattern as the TAR (q251) and MP4 (q267) tiers.
# ---------------------------------------------------------------------------

WARC_RECORD_SCHEMA = (
    "media_id long, record_idx int, warc_type string, target_uri string, "
    "content_length long, payload_md5 string"
)


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (zlib writes a zero-MTIME gzip
    header, unlike the gzip module's wall-clock stamp)."""
    import zlib

    c = zlib.compressobj(9, zlib.DEFLATED, 31)
    return c.compress(raw) + c.flush()


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the CommonCrawl
    convention: each WARC record its own member, members abutted).
    Truncated members and trailing garbage raise."""
    import zlib

    out = []
    while buf:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(buf))
        except zlib.error as e:
            raise ValueError(f"bad gzip member: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member")
        buf = d.unused_data
    return b"".join(out)


def synthesize_warc_corpus(
    df: DataFrame, id_col: str = "doc_id", gzip_records: bool = False
) -> DataFrame:
    """Deterministic WARC/1.0 files per id: a 'warcinfo' head record
    followed by 1 + id%3 'response' records; response i targets
    http://site-{id%50}.test/page/{i} and carries 30 + (id*11 + i*17)
    % 90 repeats of the letter chr(97 + (id+i) % 26). CRLF framing and
    the two empty lines between records per the ISO 28500 spec. With
    ``gzip_records`` each record is its own gzip member and the
    members are concatenated — exactly how CommonCrawl ships .warc.gz
    (record-level members keep the file seekable by offset).
    Map-only mapInPandas."""

    def batches(it):
        import pandas as pd

        def record(headers: list, body: bytes) -> bytes:
            head = b"WARC/1.0\r\n" + b"".join(
                k.encode() + b": " + v.encode() + b"\r\n"
                for k, v in headers
            )
            return (
                head
                + b"Content-Length: "
                + str(len(body)).encode()
                + b"\r\n\r\n"
                + body
                + b"\r\n\r\n"
            )

        def build(mid: int) -> bytes:
            out = [
                record(
                    [
                        ("WARC-Type", "warcinfo"),
                        ("WARC-Record-ID", f"<urn:test:{mid}:info>"),
                    ],
                    b"software: synthetic-warc/1.0",
                )
            ]
            for i in range(1 + mid % 3):
                size = 30 + (mid * 11 + i * 17) % 90
                body = chr(97 + (mid + i) % 26).encode() * size
                out.append(
                    record(
                        [
                            ("WARC-Type", "response"),
                            ("WARC-Record-ID", f"<urn:test:{mid}:{i}>"),
                            (
                                "WARC-Target-URI",
                                f"http://site-{mid % 50}.test/page/{i}",
                            ),
                        ],
                        body,
                    )
                )
            if gzip_records:
                return b"".join(_gzip_member(r) for r in out)
            return b"".join(out)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": [build(int(m)) for m in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


def _warc_walk(buf: bytes):
    """Shared WARC/1.0 record walk: yields (record_idx, headers dict
    with lowercased keys, body bytes) per record. Framing is enforced —
    a record without the WARC/ version line, a missing Content-Length,
    a body shorter than declared, or missing CRLFCRLF terminators
    raise."""
    pos = 0
    idx = 0
    while pos < len(buf):
        eol = buf.find(b"\r\n", pos)
        if eol < 0 or not buf[pos:eol].startswith(b"WARC/"):
            raise ValueError(f"bad record header at byte {pos}")
        pos = eol + 2
        headers = {}
        while True:
            eol = buf.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("unterminated header block")
            line = buf[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b": ")
            headers[k.decode().lower()] = v.decode()
        if "content-length" not in headers:
            raise ValueError("record without Content-Length")
        n = int(headers["content-length"])
        body = buf[pos : pos + n]
        if len(body) != n:
            raise ValueError("body shorter than Content-Length")
        pos += n
        if buf[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("missing record terminator")
        pos += 4
        yield idx, headers, body
        idx += 1


def decode_warc_records(
    df: DataFrame,
    include_payload: bool = False,
    compression: str | None = None,
) -> DataFrame:
    """Walk each payload's WARC records: one output row per record
    with (media_id, record_idx, warc_type, target_uri, content_length,
    payload_md5). With ``include_payload=True`` a ``payload_text``
    column carries each body decoded as UTF-8 (the bare-body corpus
    shape where the record payload IS the document; an undecodable
    body raises with the media id — for wild crawls whose response
    payloads carry an HTTP message with arbitrary charsets, use
    ``decode_warc_http_responses``, which parses the envelope and
    selects the charset instead of raising). Framing is enforced per
    ``_warc_walk``. ``compression='gzip'`` accepts the .warc.gz shape
    (one gzip member per record, members concatenated — the
    CommonCrawl convention); truncated members raise with the media
    id. Map-only mapInPandas; payloads never visit the driver."""
    if compression not in (None, "gzip"):
        raise ValueError(
            f"compression must be None or 'gzip', got {compression!r}"
        )

    def batches(it):
        import hashlib

        import pandas as pd

        def walk(buf: bytes):
            if compression == "gzip":
                buf = _gunzip_members(buf)
            out = []
            for idx, headers, body in _warc_walk(buf):
                rec = (
                    idx,
                    headers.get("warc-type", ""),
                    headers.get("warc-target-uri"),
                    len(body),
                    hashlib.md5(body).hexdigest(),
                )
                if include_payload:
                    rec += (body.decode("utf-8"),)
                out.append(rec)
            return out

        cols = [
            "media_id", "record_idx", "warc_type", "target_uri",
            "content_length", "payload_md5",
        ] + (["payload_text"] if include_payload else [])
        for pdf in it:
            rows = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    recs = walk(bytes(payload))
                except (ValueError, UnicodeDecodeError) as e:
                    raise ValueError(
                        f"malformed warc payload for media_id={int(mid)}: {e}"
                    ) from e
                for r in recs:
                    rows["media_id"].append(int(mid))
                    for k, v in zip(cols[1:], r):
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    schema = WARC_RECORD_SCHEMA + (
        ", payload_text string" if include_payload else ""
    )
    return df.mapInPandas(batches, schema=schema)


def synthesize_crawl_warc_corpus(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic single-page crawl shards: one WARC/1.0 file per
    document whose sole response record targets a MESSY URL variant
    (uppercase host / default port / tracking params / fragment /
    trailing slash / shuffled param order by id%4 — the q274
    construction) and whose body is the deterministic HTML page
    wrapper around the document's text (the q275 construction,
    UTF-8-encoded, Content-Length in BYTES). Feeds the end-to-end
    web-ingestion pipeline: decode -> extract -> normalize -> dedup.
    Map-only mapInPandas."""

    def batches(it):
        import pandas as pd

        def messy_url(mid: int) -> str:
            b = mid % 97
            v = mid % 4
            if v == 0:
                return (
                    f"HTTP://Site-{b}.COM:80/p/{b}/"
                    f"?b=2&a=1&utm_source=x#frag"
                )
            if v == 1:
                return f"http://site-{b}.com/p/{b}?a=1&b=2"
            if v == 2:
                return f"http://site-{b}.com:80/p/{b}/?fbclid=q&a=1&b=2"
            return f"http://site-{b}.com/other/{b}"

        def page(mid: int, text: str) -> bytes:
            return (
                "<html><head><title>Doc</title>"
                '<style type="text/css">p { color: red; }</style>'
                "<script>var x = 1 < 2 && doc;</script></head>"
                f"<body><!-- comment {mid} -->"
                f"<h1>Doc {mid}</h1>"
                f'<p class="main">{text}</p>'
                "<p>Fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;s&#39;"
                " &amp;lt;kept&amp;gt;</p></body></html>"
            ).encode("utf-8")

        def record(headers: list, body: bytes) -> bytes:
            head = b"WARC/1.0\r\n" + b"".join(
                k.encode() + b": " + v.encode() + b"\r\n"
                for k, v in headers
            )
            return (
                head
                + b"Content-Length: "
                + str(len(body)).encode()
                + b"\r\n\r\n"
                + body
                + b"\r\n\r\n"
            )

        for pdf in it:
            payloads = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                payloads.append(
                    record(
                        [
                            ("WARC-Type", "warcinfo"),
                            ("WARC-Record-ID", f"<urn:test:{mid}:info>"),
                        ],
                        b"software: synthetic-warc/1.0",
                    )
                    + record(
                        [
                            ("WARC-Type", "response"),
                            ("WARC-Record-ID", f"<urn:test:{mid}:0>"),
                            ("WARC-Target-URI", messy_url(mid)),
                        ],
                        page(mid, str(text)),
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


def synthesize_http_warc_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gzip_records: bool = False,
) -> DataFrame:
    """Deterministic crawl shards whose response payloads carry a FULL
    HTTP message (status line + headers + CRLFCRLF + body) — the shape
    WARC `response` records actually have in the wild, where bodies
    are frequently NOT UTF-8. Five variants by id % 5 exercise every
    charset-selection path of ``decode_warc_http_responses``:

    - v0: 200, ``Content-Type: text/html; charset=utf-8`` — header
      declares; UTF-8 body.
    - v1: 200, ``Content-Type: text/html`` (no charset); the body's
      ``<meta charset="iso-8859-1">`` declares; latin-1 body with an
      0xE9 ('é') byte.
    - v2: 200, ``Content-Type: text/html``; NOTHING declares; latin-1
      body with an 0xE9 byte (invalid as UTF-8 -> fallback path).
    - v3: 404 Not Found, text/html — screened out (non-2xx).
    - v4: 200, ``Content-Type: application/pdf`` + a binary body —
      screened out (non-HTML).

    The HTML body is ``<html><body><p>{text}{marker}</p></body></html>``
    where the marker is '' (v0), ' café 1' (v1), ' café 2' (v2) — the
    accents force the non-UTF-8 bytes. ``gzip_records`` wraps each
    record in its own gzip member (the .warc.gz convention). Map-only
    mapInPandas; the q273 record/CRLF framing unchanged."""

    def batches(it):
        import pandas as pd

        def record(headers: list, body: bytes) -> bytes:
            head = b"WARC/1.0\r\n" + b"".join(
                k.encode() + b": " + v.encode() + b"\r\n"
                for k, v in headers
            )
            return (
                head
                + b"Content-Length: "
                + str(len(body)).encode()
                + b"\r\n\r\n"
                + body
                + b"\r\n\r\n"
            )

        def http(status: str, ctype: str, body: bytes) -> bytes:
            return (
                f"HTTP/1.1 {status}\r\n"
                f"Content-Type: {ctype}\r\n"
                "X-Crawler: synthetic/1.0\r\n\r\n"
            ).encode("ascii") + body

        def page(mid: int, text: str) -> tuple[bytes, bytes]:
            v = mid % 5
            if v == 1:
                html = (
                    '<html><head><meta charset="iso-8859-1"></head>'
                    f"<body><p>{text} café 1</p></body></html>"
                )
                return http("200 OK", "text/html", html.encode("latin-1"))
            if v == 2:
                html = f"<html><body><p>{text} café 2</p></body></html>"
                return http("200 OK", "text/html", html.encode("latin-1"))
            html = f"<html><body><p>{text}</p></body></html>"
            if v == 3:
                return http(
                    "404 Not Found", "text/html; charset=utf-8",
                    html.encode("utf-8"),
                )
            if v == 4:
                return http(
                    "200 OK", "application/pdf",
                    b"%PDF-1.4\x00" + bytes([mid % 256]) * 16,
                )
            return http(
                "200 OK", "text/html; charset=utf-8", html.encode("utf-8")
            )

        for pdf in it:
            payloads = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                recs = [
                    record(
                        [
                            ("WARC-Type", "warcinfo"),
                            ("WARC-Record-ID", f"<urn:test:{mid}:info>"),
                        ],
                        b"software: synthetic-warc/1.0",
                    ),
                    record(
                        [
                            ("WARC-Type", "response"),
                            ("WARC-Record-ID", f"<urn:test:{mid}:0>"),
                            (
                                "WARC-Target-URI",
                                f"http://site-{mid % 97}.com/p/{mid % 97}",
                            ),
                        ],
                        page(mid, str(text)),
                    ),
                ]
                payloads.append(
                    b"".join(
                        _gzip_member(r) for r in recs
                    ) if gzip_records else b"".join(recs)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


WARC_HTTP_SCHEMA = (
    "media_id long, record_idx int, warc_type string, target_uri string, "
    "content_length long, http_status int, content_type string, "
    "charset string, charset_source string, is_html boolean, "
    "body_bytes long, body_text string"
)


def decode_warc_http_responses(
    df: DataFrame, compression: str | None = None
) -> DataFrame:
    """Walk WARC records AND parse each ``response`` record's HTTP
    envelope — the first thing real crawl data (CommonCrawl et al.)
    needs that the bare-body walk (q273) does not handle: status line,
    headers, and a body in an arbitrary charset.

    Per record: (media_id, record_idx, warc_type, target_uri,
    content_length, http_status, content_type, charset,
    charset_source, is_html, body_bytes, body_text). Non-``response``
    records carry NULL HTTP columns. For responses:

    - ``http_status``: from the status line (``HTTP/x.y NNN ...``); a
      response record whose payload is not an HTTP message, or whose
      header block lacks the CRLFCRLF terminator, raises with the
      media id (malformed crawl shard, not data).
    - ``content_type``: the media type, lowercased, parameters
      stripped. ``is_html`` = text/html or application/xhtml+xml.
    - Screening is RELATIONAL, not silent: ``body_text`` is non-NULL
      iff 2xx AND is_html — non-2xx and non-HTML rows stay in the
      relation with NULL charset/body so a downstream filter states
      the screen.
    - Charset selection (the production crawl order): ``charset=``
      parameter of the Content-Type header, else a ``<meta
      charset=..>`` / ``http-equiv Content-Type`` sniff of the first
      1024 body bytes (latin-1-decoded for the scan), else strict
      UTF-8 trial, else latin-1 (never fails). ``charset_source`` in
      ('header', 'meta', 'fallback'); the fallback's ``charset`` is
      'utf-8' or 'latin-1' by which branch decoded. Declared charsets
      decode with errors='replace' (a lying server must not kill the
      pipeline); unknown declared charset names raise with the media
      id. ``body_bytes`` is the raw HTTP-body byte count (before any
      decode).

    ``compression='gzip'`` accepts the .warc.gz member-per-record
    shape. Map-only mapInPandas; payloads never visit the driver.
    100-TB shape: one pass, no shuffle — the per-record work is
    O(bytes) and the meta sniff is capped at 1 KiB."""
    import re

    if compression not in (None, "gzip"):
        raise ValueError(
            f"compression must be None or 'gzip', got {compression!r}"
        )
    meta_re = re.compile(
        r"(?is)<meta[^>]+charset\s*=\s*[\"']?([\w\-:.]+)"
    )

    def batches(it):
        import codecs

        import pandas as pd

        def parse_http(body: bytes):
            split = body.find(b"\r\n\r\n")
            if split < 0:
                raise ValueError("HTTP message without header terminator")
            head, payload = body[:split], body[split + 4 :]
            lines = head.split(b"\r\n")
            status_parts = lines[0].split(None, 2)
            if (
                len(status_parts) < 2
                or not status_parts[0].startswith(b"HTTP/")
                or not status_parts[1].isdigit()
            ):
                raise ValueError(f"bad HTTP status line {lines[0]!r}")
            status = int(status_parts[1])
            headers = {}
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                headers[k.decode("latin-1").strip().lower()] = v.decode(
                    "latin-1"
                ).strip()
            ct_full = headers.get("content-type", "")
            ctype = ct_full.split(";")[0].strip().lower() or None
            is_html = ctype in ("text/html", "application/xhtml+xml")
            charset = source = text = None
            if 200 <= status < 300 and is_html:
                m = re.search(
                    r"(?i)charset\s*=\s*[\"']?([\w\-:.]+)", ct_full
                )
                if m:
                    charset, source = m.group(1).lower(), "header"
                else:
                    sniff = meta_re.search(
                        payload[:1024].decode("latin-1")
                    )
                    if sniff:
                        charset, source = sniff.group(1).lower(), "meta"
                if charset is not None:
                    # A lying server must not kill the pipeline: a
                    # typo'd charset label ('utf8mb4', 'win-1252') is
                    # exactly as wild as undecodable bytes, so an
                    # unknown declared name falls through to the same
                    # fallback trial as a missing declaration instead
                    # of raising (the raise stays for structurally
                    # malformed HTTP only).
                    try:
                        codecs.lookup(charset)
                    except LookupError:
                        charset = None
                if charset is not None:
                    text = payload.decode(charset, errors="replace")
                else:
                    source = "fallback"
                    try:
                        text = payload.decode("utf-8")
                        charset = "utf-8"
                    except UnicodeDecodeError:
                        text = payload.decode("latin-1")
                        charset = "latin-1"
            return (
                status, ctype, charset, source, is_html,
                len(payload), text,
            )

        cols = [
            "media_id", "record_idx", "warc_type", "target_uri",
            "content_length", "http_status", "content_type", "charset",
            "charset_source", "is_html", "body_bytes", "body_text",
        ]
        for pdf in it:
            rows = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    raw = bytes(payload)
                    if compression == "gzip":
                        raw = _gunzip_members(raw)
                    for idx, headers, body in _warc_walk(raw):
                        wtype = headers.get("warc-type", "")
                        if wtype == "response":
                            http = parse_http(body)
                        else:
                            http = (None,) * 5 + (None, None)
                        rows["media_id"].append(int(mid))
                        rows["record_idx"].append(idx)
                        rows["warc_type"].append(wtype)
                        rows["target_uri"].append(
                            headers.get("warc-target-uri")
                        )
                        rows["content_length"].append(len(body))
                        for k, v in zip(cols[5:], http):
                            rows[k].append(v)
                except ValueError as e:
                    raise ValueError(
                        f"malformed warc payload for media_id={int(mid)}: {e}"
                    ) from e
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=WARC_HTTP_SCHEMA)


ZIP_MEMBER_SCHEMA = (
    "media_id long, member_idx int, name string, method string, "
    "uncompressed_size long, payload_md5 string"
)


def synthesize_zip_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic ZIP archives per id, built byte-by-byte from the
    APPNOTE spec (local file headers + central directory + EOCD, no
    zipfile module — the same from-the-spec pattern as the TAR/MP4/
    WARC tiers): 1 + id%3 members, member j named
    ``doc{id}/part{j}.txt`` with 20 + (id*7 + j*13) % 60 repeats of
    chr(97 + (id+j) % 26), STORED when (id+j) is even, DEFLATE (raw,
    zlib level 9) when odd; zeroed DOS timestamps so archives are
    bit-reproducible. Map-only mapInPandas."""

    def batches(it):
        import struct
        import zlib

        import pandas as pd

        def build(mid: int) -> bytes:
            out = bytearray()
            central = bytearray()
            offsets = []
            for j in range(1 + mid % 3):
                name = f"doc{mid}/part{j}.txt".encode()
                size = 20 + (mid * 7 + j * 13) % 60
                data = chr(97 + (mid + j) % 26).encode() * size
                crc = zlib.crc32(data)
                if (mid + j) % 2 == 0:
                    method, payload = 0, data
                else:
                    c = zlib.compressobj(9, zlib.DEFLATED, -15)
                    method, payload = 8, c.compress(data) + c.flush()
                offsets.append(len(out))
                out += struct.pack(
                    "<IHHHHHIIIHH",
                    0x04034B50, 20, 0, method, 0, 0,
                    crc, len(payload), len(data), len(name), 0,
                )
                out += name + payload
                central += struct.pack(
                    "<IHHHHHHIIIHHHHHII",
                    0x02014B50, 20, 20, 0, method, 0, 0,
                    crc, len(payload), len(data), len(name),
                    0, 0, 0, 0, 0, offsets[-1],
                )
                central += name
            cd_off = len(out)
            n = 1 + mid % 3
            out += central
            out += struct.pack(
                "<IHHHHIIH",
                0x06054B50, 0, 0, n, n, len(central), cd_off, 0,
            )
            return bytes(out)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": [build(int(m)) for m in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


def decode_zip_members(df: DataFrame) -> DataFrame:
    """Walk each payload's ZIP members from the central directory (the
    spec's source of truth — streaming from local headers alone is the
    classic zip-parsing bug): locate the EOCD, parse the directory,
    verify each member's local-header signature and name agree, inflate
    (raw deflate) or copy (stored), and validate CRC-32 and declared
    sizes. A missing/duplicate EOCD signature, an unknown method, a
    local/central mismatch, or a CRC/size mismatch raises with the
    media id — archive corruption is data loss, not a warning.
    Map-only mapInPandas; payloads never visit the driver. Returns
    (media_id, member_idx, name, method 'stored'|'deflate',
    uncompressed_size, payload_md5) — compressed size is
    implementation-defined for deflate, so it is validated internally
    but not part of the relational contract."""

    def batches(it):
        import hashlib
        import struct
        import zlib

        import pandas as pd

        def walk(buf: bytes):
            eocd = buf.rfind(struct.pack("<I", 0x06054B50))
            if eocd < 0:
                raise ValueError("no end-of-central-directory record")
            (
                _, _, _, n_disk, n_total, cd_size, cd_off, comment_len,
            ) = struct.unpack("<IHHHHIIH", buf[eocd : eocd + 22])
            if eocd + 22 + comment_len != len(buf):
                raise ValueError("trailing bytes after EOCD")
            if n_disk != n_total:
                raise ValueError("multi-disk archive not supported")
            pos = cd_off
            out = []
            for idx in range(n_total):
                (
                    sig, _, _, _, method, _, _, crc, csize, usize,
                    namelen, extralen, commentlen, _, _, _, loc_off,
                ) = struct.unpack("<IHHHHHHIIIHHHHHII", buf[pos : pos + 46])
                if sig != 0x02014B50:
                    raise ValueError(
                        f"bad central-directory signature at member {idx}"
                    )
                name = buf[pos + 46 : pos + 46 + namelen].decode("utf-8")
                pos += 46 + namelen + extralen + commentlen
                (lsig, _, _, lmethod, _, _, lcrc, _, _, lnamelen, lextra) = (
                    struct.unpack("<IHHHHHIIIHH", buf[loc_off : loc_off + 30])
                )
                if lsig != 0x04034B50:
                    raise ValueError(f"bad local-header signature for {name}")
                lname = buf[
                    loc_off + 30 : loc_off + 30 + lnamelen
                ].decode("utf-8")
                if lname != name or lmethod != method:
                    raise ValueError(
                        f"local/central mismatch for member {name}"
                    )
                start = loc_off + 30 + lnamelen + lextra
                payload = buf[start : start + csize]
                if len(payload) != csize:
                    raise ValueError(f"truncated member {name}")
                if method == 0:
                    data = payload
                elif method == 8:
                    data = zlib.decompress(payload, wbits=-15)
                else:
                    raise ValueError(
                        f"unsupported compression method {method} for {name}"
                    )
                if len(data) != usize:
                    raise ValueError(f"size mismatch for member {name}")
                if zlib.crc32(data) != crc or lcrc != crc:
                    raise ValueError(f"CRC mismatch for member {name}")
                out.append(
                    (
                        idx,
                        name,
                        "stored" if method == 0 else "deflate",
                        usize,
                        hashlib.md5(data).hexdigest(),
                    )
                )
            if pos != eocd:
                raise ValueError("central directory size mismatch")
            return out

        cols = [
            "media_id", "member_idx", "name", "method",
            "uncompressed_size", "payload_md5",
        ]
        for pdf in it:
            rows = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    members = walk(bytes(payload))
                except (ValueError, struct.error, zlib.error) as e:
                    raise ValueError(
                        f"malformed zip payload for media_id={int(mid)}: {e}"
                    ) from e
                for m in members:
                    rows["media_id"].append(int(mid))
                    for k, v in zip(cols[1:], m):
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=ZIP_MEMBER_SCHEMA)


def _fmp4_track_params(mid: int, f: int) -> dict:
    """Deterministic per-(media, fragment) parameters shared by
    synthesis, the walk's expectations, and the SQL oracle (q276)."""
    n = 3 + (mid + 7 * f) % 6
    return {
        "n_samples": n,
        "delta": 50 + (mid + f) % 20,
        "sizes": [10 + (mid + f + j) % 15 for j in range(n)],
    }


def synthesize_fmp4_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic FRAGMENTED MP4 (CMAF/DASH delivery shape) per id:
    an init segment (ftyp + moov holding one trak whose stbl declares
    the codec but carries empty sample tables, the fMP4 convention)
    followed by 1 + id%3 moof+mdat fragment pairs — each moof carries
    mfhd sequence numbering and a traf/tfhd/trun whose per-sample
    duration+size table describes exactly the bytes in its mdat.
    Pure stdlib struct; map-only mapInPandas."""

    def batches(it):
        import struct

        import pandas as pd

        def build(mid: int) -> bytes:
            ftyp = _mp4_box(
                b"ftyp", b"iso6" + struct.pack(">I", 1) + b"iso6cmfc"
            )
            # init-segment moov: stsd with the codec, zero-entry tables
            stsd = _mp4_full_box(
                b"stsd",
                0,
                struct.pack(">I", 1)
                + struct.pack(">I4s", 16, b"avc1")
                + b"\x00" * 8,
            )
            empty = b"".join(
                _mp4_full_box(t, 0, struct.pack(">I", 0))
                for t in (b"stts", b"stsc", b"stco")
            ) + _mp4_full_box(b"stsz", 0, struct.pack(">II", 0, 0))
            stbl = _mp4_box(b"stbl", stsd + empty)
            mdhd = _mp4_full_box(
                b"mdhd",
                0,
                struct.pack(">IIIII", 0, 0, 600, 0, 0),
            )
            hdlr = _mp4_full_box(
                b"hdlr",
                0,
                struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00",
            )
            mdia = _mp4_box(
                b"mdia", mdhd + hdlr + _mp4_box(b"minf", stbl)
            )
            tkhd = _mp4_full_box(
                b"tkhd",
                0,
                struct.pack(">IIIII", 0, 0, 1, 0, 0) + b"\x00" * 60,
            )
            mvhd = _mp4_full_box(
                b"mvhd",
                0,
                struct.pack(">IIII", 0, 0, 1000, 0) + b"\x00" * 80,
            )
            moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd + mdia))
            frags = []
            for f in range(1, 2 + mid % 3):
                p = _fmp4_track_params(mid, f)
                mfhd = _mp4_full_box(b"mfhd", 0, struct.pack(">I", f))
                tfhd = _mp4_full_box(b"tfhd", 0, struct.pack(">I", 1))
                trun_body = struct.pack(">I", p["n_samples"]) + b"".join(
                    struct.pack(">II", p["delta"], s) for s in p["sizes"]
                )
                # flags 0x000300: sample-duration + sample-size present
                trun = _mp4_box(
                    b"trun", struct.pack(">I", 0x000300) + trun_body
                )
                traf = _mp4_box(b"traf", tfhd + trun)
                moof = _mp4_box(b"moof", mfhd + traf)
                body = bytes(
                    (mid + f + j) % 256
                    for j, s in enumerate(p["sizes"])
                    for _ in range(s)
                )
                frags.append(moof + _mp4_box(b"mdat", body))
            return ftyp + moov + b"".join(frags)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": [build(int(m)) for m in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


FMP4_FRAGMENT_SCHEMA = (
    "media_id long, fragment_seq long, track_id long, n_samples long, "
    "duration long, sample_bytes long"
)


def decode_fmp4_fragments(df: DataFrame) -> DataFrame:
    """Walk a fragmented MP4's moof+mdat pairs: per fragment, the mfhd
    sequence number, traf's tfhd track id, and the trun sample table's
    count / total duration / total bytes — VALIDATED against the
    paired mdat's actual body size (a fragment whose trun promises
    more bytes than its mdat carries raises with the media id, as do
    unpaired moofs and malformed boxes). This is the integrity walk a
    pipeline runs over CMAF/DASH-delivered shards before slicing them.
    Map-only mapInPandas; no codec decode."""

    def batches(it):
        import struct

        import pandas as pd

        def children(buf, start, end):
            off = start
            while off + 8 <= end:
                size, btype = struct.unpack_from(">I4s", buf, off)
                header = 8
                if size == 1:
                    (size,) = struct.unpack_from(">Q", buf, off + 8)
                    header = 16
                elif size == 0:
                    size = end - off
                if size < header or off + size > end:
                    raise ValueError(
                        f"box {btype!r} at {off} has bad size {size}"
                    )
                yield btype.decode("latin-1"), off + header, off + size
                off += size
            if off != end:
                raise ValueError(f"trailing bytes after {off}")

        def find(buf, start, end, btype):
            for t, s, e in children(buf, start, end):
                if t == btype:
                    return s, e
            return None

        def walk(buf):
            out = []
            pending = None  # (seq, track, n, dur, bytes) awaiting mdat
            for t, s, e in children(buf, 0, len(buf)):
                if t == "moof":
                    if pending is not None:
                        raise ValueError("moof without its mdat")
                    mfhd = find(buf, s, e, "mfhd")
                    traf = find(buf, s, e, "traf")
                    if mfhd is None or traf is None:
                        raise ValueError("moof missing mfhd/traf")
                    (seq,) = struct.unpack_from(">I", buf, mfhd[0] + 4)
                    tfhd = find(buf, *traf, "tfhd")
                    trun = find(buf, *traf, "trun")
                    if tfhd is None or trun is None:
                        raise ValueError("traf missing tfhd/trun")
                    (track,) = struct.unpack_from(">I", buf, tfhd[0] + 4)
                    (flags,) = struct.unpack_from(">I", buf, trun[0])
                    flags &= 0xFFFFFF
                    if flags & 0x300 != 0x300:
                        raise ValueError(
                            "trun without per-sample duration+size"
                        )
                    (n,) = struct.unpack_from(">I", buf, trun[0] + 4)
                    dur = total = 0
                    for j in range(n):
                        d, sz = struct.unpack_from(
                            ">II", buf, trun[0] + 8 + 8 * j
                        )
                        dur += d
                        total += sz
                    pending = (seq, track, n, dur, total)
                elif t == "mdat":
                    if pending is None:
                        continue  # init segment has no floating mdat
                    if e - s != pending[4]:
                        raise ValueError(
                            f"mdat size {e - s} != trun total {pending[4]}"
                        )
                    out.append(pending)
                    pending = None
            if pending is not None:
                raise ValueError("trailing moof without mdat")
            return out

        cols = [
            "media_id", "fragment_seq", "track_id", "n_samples",
            "duration", "sample_bytes",
        ]
        for pdf in it:
            rows = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frags = walk(bytes(payload))
                except (ValueError, struct.error) as e:
                    raise ValueError(
                        f"malformed fmp4 payload for media_id={int(mid)}:"
                        f" {e}"
                    ) from e
                for fr in frags:
                    rows["media_id"].append(int(mid))
                    for k, v in zip(cols[1:], fr):
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=FMP4_FRAGMENT_SCHEMA)
