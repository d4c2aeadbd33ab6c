"""Property-based invariants (hypothesis) for the stdlib media
decoders: the PNG encode->decode roundtrip must reconstruct dimensions
and pixel sums for ARBITRARY matrices under ARBITRARY per-scanline
filter choices (every defilter branch), and the WAV energy segmenter
must recover exactly the planted loud runs for ARBITRARY span
structures. Pure-Python (the parse kernels are plain functions used
inside the Arrow batches), so these run without a SparkSession."""

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from delta_lake_spark.operators.multimodal import (
    _parse_png,
    _parse_wav_pcm,
    tiny_png_bytes,
)

matrices = st.integers(min_value=1, max_value=10).flatmap(
    lambda w: st.lists(
        st.lists(
            st.integers(min_value=0, max_value=255), min_size=w, max_size=w
        ),
        min_size=1,
        max_size=10,
    )
)


@settings(max_examples=60, deadline=None)
@given(rows=matrices, data=st.data())
def test_png_roundtrip_property(rows, data):
    """decode(encode(rows, any filters)) recovers (w, h, sum(pixels))
    exactly — one wrong byte in any of the five defilter equations
    breaks the sum for some matrix."""
    filters = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=4),
            min_size=len(rows),
            max_size=len(rows),
        )
    )
    png = tiny_png_bytes(rows, filters=filters)
    n, w, h, mode, luma = _parse_png(0, png)
    assert (n, w, h, mode) == (len(png), len(rows[0]), len(rows), "L")
    assert abs(luma - sum(sum(r) for r in rows) / (w * h)) < 1e-9


rgb_matrices = st.integers(min_value=1, max_value=6).flatmap(
    lambda w: st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=255),
                st.integers(min_value=0, max_value=255),
                st.integers(min_value=0, max_value=255),
            ),
            min_size=w,
            max_size=w,
        ),
        min_size=1,
        max_size=6,
    )
)


@settings(max_examples=60, deadline=None)
@given(rows=rgb_matrices, data=st.data())
def test_png_rgb_roundtrip_property(rows, data):
    """RGB (bpp=3) defiltering: a/b/c reference the byte THREE back,
    so a stride bug survives every grayscale test — this pins the RGB
    reconstruction against the ITU-R 601-2 weighted mean for arbitrary
    matrices and filter choices, plus PIL pixel readback when
    importable."""
    filters = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=4),
            min_size=len(rows),
            max_size=len(rows),
        )
    )
    png = tiny_png_bytes(rows, filters=filters, color="RGB")
    n, w, h, mode, luma = _parse_png(0, png)
    assert (n, w, h, mode) == (len(png), len(rows[0]), len(rows), "RGB")
    num = sum(
        299 * r + 587 * g + 114 * b for row in rows for (r, g, b) in row
    )
    assert abs(luma - num / (1000 * w * h)) < 1e-9
    try:
        import io

        from PIL import Image
    except ImportError:
        return
    img = Image.open(io.BytesIO(png))
    assert list(img.getdata()) == [tuple(px) for row in rows for px in row]


@settings(max_examples=60, deadline=None)
@given(rows=matrices)
def test_png_pixels_match_pil_when_available(rows):
    """When PIL is importable the stdlib decoder's pixel sum must agree
    with PIL's full pixel readback on the same bytes (second,
    independent implementation of the format)."""
    try:
        import io

        from PIL import Image
    except ImportError:
        png = tiny_png_bytes(rows, filters=[4] * len(rows))
        _, w, h, _, luma = _parse_png(0, png)
        assert abs(luma - sum(sum(r) for r in rows) / (w * h)) < 1e-9
        return
    png = tiny_png_bytes(rows, filters=[(i * 3 + 1) % 5 for i in range(len(rows))])
    img = Image.open(io.BytesIO(png))
    assert list(img.getdata()) == [v for r in rows for v in r]


spans = st.lists(
    st.tuples(
        st.booleans(),  # loud?
        st.integers(min_value=1, max_value=4),  # windows in the span
    ),
    min_size=1,
    max_size=8,
)


def _wav_from_spans(span_list, amp, frame=4):
    """Mono 16-bit PCM WAV whose samples are a ±amp square wave inside
    loud spans and 0 elsewhere, span lengths in whole analysis
    windows."""
    frames = bytearray()
    j = 0
    for loud, n_win in span_list:
        for _ in range(n_win * frame):
            v = (amp if j % 2 == 0 else -amp) if loud else 0
            frames += struct.pack("<h", v)
            j += 1
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


@settings(max_examples=60, deadline=None)
@given(span_list=spans, amp=st.integers(min_value=1, max_value=30000))
def test_wav_segment_runs_property(span_list, amp):
    """Windowed-RMS segmentation over an arbitrary loud/silent span
    structure recovers exactly the MERGED maximal loud runs (adjacent
    loud spans coalesce), each with RMS == amp."""
    frame = 4
    wav = _wav_from_spans(span_list, amp, frame=frame)
    _, _, _, vals = _parse_wav_pcm(0, wav)
    # reference segmentation in plain python over window flags
    flags = []
    for loud, n_win in span_list:
        flags += [loud] * n_win
    expected, cur = [], None
    for w, loud in enumerate(flags):
        if loud:
            cur = [w * frame, 0] if cur is None else cur
            cur[1] += frame
        elif cur is not None:
            expected.append(tuple(cur))
            cur = None
    if cur is not None:
        expected.append(tuple(cur))

    # run the same kernel the operator uses
    got = []
    gcur = None
    for wdx in range(len(vals) // frame):
        w = vals[wdx * frame : (wdx + 1) * frame]
        rms = math.sqrt(sum(v * v for v in w) / frame)
        if rms >= 1.0:
            assert abs(rms - amp) < 1e-9  # square wave -> exact RMS
            gcur = [wdx * frame, 0] if gcur is None else gcur
            gcur[1] += frame
        elif gcur is not None:
            got.append(tuple(gcur))
            gcur = None
    if gcur is not None:
        got.append(tuple(gcur))
    assert got == expected


@settings(max_examples=40, deadline=None)
@given(
    rows=matrices,
    out_w=st.integers(min_value=1, max_value=8),
    out_h=st.integers(min_value=1, max_value=8),
)
def test_resize_nearest_neighbor_property(rows, out_w, out_h):
    """decode(resize(encode(rows))) equals the plain-python NN sample
    for arbitrary matrices and output geometries (up- and down-scale),
    and the re-encoded thumbnail is itself a valid PNG."""
    from delta_lake_spark.operators.multimodal import _parse_png_pixels

    png = tiny_png_bytes(rows, filters=[(r + 1) % 5 for r in range(len(rows))])
    w, h = len(rows[0]), len(rows)
    # kernel-level resize (same code path the operator batches over)
    src_w, src_h, mode, src_rows = _parse_png_pixels(0, png)
    assert (src_w, src_h, mode) == (w, h, "L")
    resized = [
        [src_rows[(r * h) // out_h][(c * w) // out_w] for c in range(out_w)]
        for r in range(out_h)
    ]
    thumb = tiny_png_bytes(resized)
    tw, th, tmode, trows = _parse_png_pixels(0, thumb)
    assert (tw, th, tmode) == (out_w, out_h, "L")
    expected = [
        [rows[(r * h) // out_h][(c * w) // out_w] for c in range(out_w)]
        for r in range(out_h)
    ]
    assert [list(r) for r in trows] == expected


def test_wav_pcm_mixdown_stereo():
    """Stereo payloads mix down per sample-frame (average of the
    channels), matching the mono equivalent."""
    frames = bytearray()
    mono_vals = [100, -100, 250, 0, -32768, 32767]
    for v in mono_vals:
        frames += struct.pack("<hh", v, v)  # L == R
    data = bytes(frames)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    wav = (
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
    _, _, _, vals = _parse_wav_pcm(0, wav)
    assert vals == [float(v) for v in mono_vals]
