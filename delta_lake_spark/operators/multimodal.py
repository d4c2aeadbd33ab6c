"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery (schemas, mapInPandas batching, partitioning)
is real and tested. Decoding is real where the format needs only the
standard library — ``decode_wav_meta`` walks RIFF/PCM chunk structure
with stdlib struct (oracle-checked roundtrip, q171) — and stubbed
where it needs an absent media library: ``decode_image_features(...,
real_decode=True)`` actually decodes when PIL is importable (pinned by
a pytest over the in-repo ``tiny_png_bytes`` fixture) and raises
NotImplementedError when it isn't; the default image path computes
deterministic fake features from the raw bytes so the distributed
plumbing is exercised end-to-end and oracle-checkable either way.

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


def tiny_png_bytes(rows: list[list[int]]) -> bytes:
    """Hand-assembled 8-bit grayscale PNG from a pixel matrix — a
    deterministic in-repo image fixture (stdlib only: zlib + struct),
    so the REAL decode branch of :func:`decode_image_features` can be
    exercised by tests whenever an image library is importable,
    without shipping binary blobs in the repo. ``rows`` is a list of
    equal-length lists of 0-255 gray values."""
    import struct
    import zlib

    if not rows or not rows[0]:
        raise ValueError("pixel matrix must be non-empty")
    width, height = len(rows[0]), len(rows)
    if any(len(r) != width for r in rows):
        raise ValueError("all pixel rows must have equal length")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    # each scanline: filter byte 0 (None) + raw gray bytes
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
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


def decode_image_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """'Decode' binary image content into features via mapInPandas.

    ``real_decode=True`` probes for an image library (PIL) at call time:
    when present, payloads are actually decoded (dimensions, mode, mean
    luminance) inside the same Arrow-batched plan; when absent it raises
    NotImplementedError naming the missing dependency. The default path
    computes deterministic byte-level pseudo-features (length, first
    byte, byte sum, fake dimensions), which keeps the Arrow batch shape,
    schema, and distributed execution identical to a real decoder —
    the tested plumbing is shared by both paths.
    """
    if real_decode:
        if _probe_image_decoder() is None:
            raise NotImplementedError(
                "real image decoding requires PIL (pillow), not installed in "
                "this environment; run with real_decode=False for the "
                "deterministic plumbing path"
            )

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


def tiny_gif_bytes(
    frames: list[tuple[int, int, int, int]],
    screen: tuple[int, int] = (16, 16),
    seed: int = 0,
) -> bytes:
    """Hand-assembled multi-frame GIF89a (stdlib only): a 2-bit global
    palette and one solid-color image per (left, top, width, height)
    entry, pixel data really LZW-encoded (see _lzw_encode_gif) so the
    file is decodable, not just walkable. The video-modality sibling
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
        data = _lzw_encode_gif([(seed + j) % 4] * (fw * fh), 2)
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


def transcribe_stub(df: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """STUB for per-chunk audio transcription: joins the chunk plan's
    offsets back over the payload and emits a deterministic checksum
    'transcript' per chunk via mapInPandas (Arrow-batched). A real
    implementation would run an ASR model here — unavailable in this
    environment; batch shape and schema match the real operator.
    ``df`` must carry media_id, content, chunk_id, start_byte, n_bytes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = []
            for content, start, n in zip(
                pdf["content"], pdf["start_byte"], pdf["n_bytes"]
            ):
                chunk = content[int(start) : int(start) + int(n)]
                texts.append(f"chunk[{int(sum(chunk)) % 99991}]")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "chunk_id": pdf["chunk_id"],
                    "transcript": texts,
                }
            )

    return df.mapInPandas(
        batches, schema="media_id long, chunk_id long, transcript string"
    )
