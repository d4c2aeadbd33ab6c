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


# ---------------------------------------------------------------------------
# Baseline JPEG (operators/jpeg.py): the writer emits real JFIF files
# and the decoder's Huffman/zigzag/dequant/IDCT pipeline must equal an
# independent numpy IDCT reference for ARBITRARY sparse coefficient
# blocks (the q226/q227 gate corpora only exercise the DC path, which
# is what makes their lossy roundtrip arithmetically exact — the
# general transform is pinned here); malformed payloads raise with the
# media id.
# ---------------------------------------------------------------------------

coeff_grids = st.lists(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=7),
                st.integers(min_value=0, max_value=7),
                st.integers(min_value=-300, max_value=300),
            ),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    ),
    min_size=1,
    max_size=3,
).filter(lambda g: len({len(r) for r in g}) == 1)


@settings(max_examples=40, deadline=None)
@given(grid=coeff_grids)
def test_jpeg_entropy_and_idct_match_reference(grid):
    import numpy as np

    from delta_lake_spark.operators.jpeg import (
        _parse_jpeg,
        idct_2d,
        tiny_jpeg_bytes,
    )

    blocks, ref = [], []
    for row in grid:
        brow = []
        for spec in row:
            c = np.zeros((8, 8), dtype=np.int64)
            for u, v, val in spec:
                c[u][v] = val
            brow.append(c)
            ref.append(
                np.clip(
                    np.floor(idct_2d(c.astype(float)) + 128.0 + 0.5),
                    0,
                    255,
                )
            )
        blocks.append(brow)
    h, w = 8 * len(grid), 8 * len(grid[0])
    data = tiny_jpeg_bytes(w, h, blocks)
    gw, gh, mode, planes = _parse_jpeg(0, data)
    assert (gw, gh, mode) == (w, h, "L")
    k = 0
    for by in range(len(grid)):
        for bx in range(len(grid[0])):
            got = planes[0][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (got.astype(float) == ref[k]).all(), (by, bx)
            k += 1


def test_jpeg_malformed_payloads_raise():
    import pytest

    from delta_lake_spark.operators.jpeg import (
        _const_block,
        _parse_jpeg,
        tiny_jpeg_bytes,
    )

    good = tiny_jpeg_bytes(8, 8, [[_const_block(200)]])
    assert _parse_jpeg(1, good)[2] == "L"
    with pytest.raises(ValueError, match="jpeg 2: missing SOI"):
        _parse_jpeg(2, b"\x89PNG" + good[2:])
    with pytest.raises(ValueError, match="jpeg 3: .*truncated"):
        _parse_jpeg(3, good[:25])
    # flip SOF0 -> SOF2 (progressive): explicit unsupported error
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="jpeg 4: only baseline"):
        _parse_jpeg(4, prog)
    # truncate inside the entropy-coded scan
    with pytest.raises(ValueError, match="jpeg 5: .*(truncated|Huffman)"):
        _parse_jpeg(5, good[:-3])
    # EOI immediately after headers (no scan)
    no_scan = good[: good.index(b"\xff\xda")] + b"\xff\xd9"
    with pytest.raises(ValueError, match="jpeg 6: EOI before SOS"):
        _parse_jpeg(6, no_scan)


def test_jpeg_color_roundtrip_exact():
    """4:2:0 constant-MCU roundtrip: every decoded pixel equals the
    JFIF-converted-and-back constant, including chroma upsampling and
    both rounding passes (the q227 contract, checked per-pixel here
    rather than via the mean)."""
    import math

    from delta_lake_spark.operators.jpeg import (
        _const_block,
        _jfif_forward,
        _parse_jpeg,
        tiny_jpeg_bytes,
    )

    r, g, b = 201, 57, 130
    y, cb, cr = _jfif_forward(r, g, b)
    yg = [[_const_block(y)] * 2 for _ in range(2)]
    data = tiny_jpeg_bytes(
        16, 16, yg, [[_const_block(cb)]], [[_const_block(cr)]]
    )
    w, h, mode, planes = _parse_jpeg(9, data)
    assert (w, h, mode) == (16, 16, "RGB")
    clamp = lambda x: min(max(math.floor(x), 0), 255)  # noqa: E731
    exp = (
        clamp(y + 1.402 * (cr - 128) + 0.5),
        clamp(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5),
        clamp(y + 1.772 * (cb - 128) + 0.5),
    )
    for ch in range(3):
        assert (planes[ch] == exp[ch]).all(), (ch, exp[ch])
