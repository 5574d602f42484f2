"""Pure-stdlib media codecs (functions/codecs.py): PNG/BMP/WAV
roundtrips, every PNG filter type, format sniffing, resampling. No Spark
session needed — these run in milliseconds."""

import struct
import zlib

import numpy as np
import pytest

from jassjr_spark.functions import codecs as C


def test_png_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for shape in [(5, 7, 3), (4, 4, 1), (6, 3, 4), (3, 9, 2)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = C.decode_png(C.encode_png(img))
        assert out.shape == shape and (out == img).all(), shape
    # 2-D grayscale input encodes as single-channel
    g = rng.integers(0, 256, (4, 5), dtype=np.uint8)
    assert (C.decode_png(C.encode_png(g))[:, :, 0] == g).all()


def test_png_decodes_every_filter_type():
    """Hand-build a PNG whose five rows use filters 0..4 (None, Sub, Up,
    Average, Paeth) and assert exact pixel recovery — the encoder only
    emits filter 0, so this is the only way to prove the decoder's
    unfilter math against the spec."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    stride, c = 18, 3
    raw, prev = b"", np.zeros(stride, np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].reshape(-1).astype(np.int32)
        enc = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[x] = (cur[x] - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = cur
    png = (
        C.PNG_SIG
        + C._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
        + C._png_chunk(b"IDAT", zlib.compress(raw))
        + C._png_chunk(b"IEND", b"")
    )
    assert (C.decode_png(png) == img).all()


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        C.decode_png(b"nope")
    # 16-bit depth is out of scope and must fail loudly, not garbage out
    bad = (
        C.PNG_SIG
        + C._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + C._png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + C._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        C.decode_png(bad)


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.default_rng(3)
    for w in (7, 8, 5):  # 7*3=21 -> stride 24 exercises the padding path
        img = rng.integers(0, 256, (5, w, 3), dtype=np.uint8)
        out = C.decode_bmp(C.encode_bmp(img))
        assert out.shape == img.shape and (out == img).all(), w


def test_wav_roundtrip_mono_and_stereo():
    t = np.linspace(0, 1, 800, dtype=np.float32)
    mono = 0.7 * np.sin(2 * np.pi * 440 * t)
    dec, rate = C.decode_wav(C.encode_wav(mono, 8000))
    assert rate == 8000 and dec.shape == (800, 1)
    assert np.abs(dec[:, 0] - mono).max() < 1e-3
    stereo = np.stack([mono, -mono], axis=1)
    dec2, _ = C.decode_wav(C.encode_wav(stereo, 16000))
    assert dec2.shape == (800, 2) and np.abs(dec2 - stereo).max() < 1e-3


def test_sniff_and_resize():
    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    assert C.sniff(C.encode_png(img)) == "png"
    assert C.sniff(C.encode_bmp(img)) == "bmp"
    assert C.sniff(C.encode_wav(np.zeros(8, np.float32), 8000)) == "wav"
    assert C.sniff(b"\x00\x01junk") == "unknown"
    up = C.resize_nearest(img, 10, 8)
    assert up.shape == (8, 10, 3)
    # each target pixel is an EXACT source pixel (nearest neighbor)
    src = {tuple(px) for px in img.reshape(-1, 3)}
    assert {tuple(px) for px in up.reshape(-1, 3)} <= src
