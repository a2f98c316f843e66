"""codecs_stdlib contract tests: the PNG/WAV codecs behind the real
multimodal decode path (mm02/mm04).

The encoder half only emits filter-0 scanlines, so the decoder's other
filter branches (Sub/Up/Average/Paeth) are exercised here by building
PNGs by hand with each filter type applied -- an independent
implementation of the RFC 2083 filter equations. If PIL is present
(not in this container) the decoder is additionally cross-checked
against it.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from modelorecomendacion_analisisspark_streaming_mas_spark.functions.codecs_stdlib import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def test_png_roundtrip_all_color_types():
    rng = np.random.default_rng(7)
    for shape in [(5, 9), (1, 1), (12, 7, 3), (6, 6, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = decode_png(encode_png(px))
        assert back.shape == px.shape
        assert (back == px).all(), shape


def test_png_roundtrip_extremes():
    for fill in (0, 255):
        px = np.full((4, 4, 3), fill, dtype=np.uint8)
        assert (decode_png(encode_png(px)) == px).all()


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_scanline(ftype, raw, prior, bpp):
    """FORWARD filter (RFC 2083 6.x) -- independent of the decoder's
    inverse implementation."""
    out = np.empty_like(raw)
    for x in range(len(raw)):
        left = int(raw[x - bpp]) if x >= bpp else 0
        up = int(prior[x])
        ul = int(prior[x - bpp]) if x >= bpp else 0
        v = int(raw[x])
        if ftype == 0:
            pass
        elif ftype == 1:
            v -= left
        elif ftype == 2:
            v -= up
        elif ftype == 3:
            v -= (left + up) >> 1
        elif ftype == 4:
            v -= _paeth_ref(left, up, ul)
        out[x] = v & 0xFF
    return out


def _build_png(px, filters):
    """Hand-assemble a PNG whose scanline y uses filter type filters[y]."""
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch)
    raw = b""
    prior = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        raw += bytes([filters[y]]) + _filter_scanline(
            filters[y], flat[y], prior, ch
        ).tobytes()
        prior = flat[y]

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_each_filter_type(ftype):
    rng = np.random.default_rng(100 + ftype)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    data = _build_png(px, filters=[ftype] * 6)
    assert (decode_png(data) == px).all()


def test_png_decode_mixed_filters_gray():
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(5, 8), dtype=np.uint8)
    data = _build_png(px, filters=[0, 1, 2, 3, 4])
    assert (decode_png(data) == px).all()


def test_png_decoder_matches_pil_if_available():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    data = encode_png(px)
    assert (np.asarray(PIL_Image.open(io.BytesIO(data))) == decode_png(data)).all()


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # 16-bit depth header on otherwise valid structure
    px = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(encode_png(px))
    data[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))


def test_wav_roundtrip_16bit_quantization_bound():
    sr = 8000
    pcm = 0.4 * np.sin(2 * np.pi * 440 * np.arange(4000) / sr)
    out, got_sr = decode_wav(encode_wav(pcm, sr))
    assert got_sr == sr and out.shape == (4000,)
    assert np.abs(out - pcm).max() < 1.0 / 32000  # half an LSB at 16-bit


def test_wav_stereo_shape():
    sr = 16000
    pcm = np.stack(
        [np.linspace(-1, 1, 100), np.linspace(1, -1, 100)], axis=1
    )
    out, got_sr = decode_wav(encode_wav(pcm, sr, channels=2))
    assert got_sr == sr and out.shape == (100, 2)
    assert np.abs(out - pcm).max() < 1.0 / 16000


def test_wav_clipping_is_saturating():
    out, _ = decode_wav(encode_wav(np.array([2.0, -2.0]), 8000))
    assert out[0] == pytest.approx(32767 / 32768)
    assert out[1] == pytest.approx(-1.0)


def test_bmp_roundtrip_gray():
    import numpy as np

    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.codecs_stdlib import (
        decode_bmp,
        encode_bmp,
    )

    # widths 5/6/7/8 cover every 4-byte row-padding case
    for w in (5, 6, 7, 8):
        px = (np.arange(9 * w).reshape(9, w) * 7 % 251).astype(np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()


def test_bmp_roundtrip_rgb():
    import numpy as np

    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.codecs_stdlib import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    # avoid the all-channels-equal gray collapse in this fixture
    px[0, 0] = [1, 2, 3]
    assert (decode_bmp(encode_bmp(px)) == px).all()


def test_bmp_rejects_unsupported():
    import pytest

    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.codecs_stdlib import (
        decode_bmp,
    )

    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PX not a bmp")


def test_decode_image_speaks_bmp_without_pil():
    """The second real container format behind decode_image's injection
    point: a BMP payload decodes on a PIL-less host (shrinking r4's
    PNG-only codec gate)."""
    import numpy as np

    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.codecs_stdlib import (
        encode_bmp,
    )
    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.multimodal import (
        decode_image,
    )

    try:
        import PIL  # noqa: F401

        import pytest

        pytest.skip("PIL present: decode_image prefers it")
    except ImportError:
        pass
    px = (np.arange(60).reshape(6, 10) * 11 % 256).astype(np.uint8)
    assert (decode_image(encode_bmp(px)) == px).all()
