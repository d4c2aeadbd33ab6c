"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery (schemas, mapInPandas batching, partitioning)
is real and tested; the actual media decoding is STUBBED because no
image/audio libraries exist in this environment. Each stub is clearly
marked: ``decode_image_features(..., real_decode=True)`` raises
NotImplementedError; the default path computes deterministic fake
features from the raw bytes so the distributed plumbing is exercised
end-to-end and oracle-checkable.

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
