"""Pure-stdlib media codecs: PNG, BMP, WAV — no imaging/audio libraries.

The container ships no PIL/libvips/ffmpeg, but three ubiquitous formats
are decodable from public specs with nothing beyond ``zlib``/``struct``/
``wave`` and numpy:

* PNG (RFC 2083): chunk parse -> zlib inflate -> per-scanline unfilter
  (None/Sub/Up/Average/Paeth), 8-bit gray / gray+alpha / RGB / RGBA,
  non-interlaced. Encoder emits filter-0 scanlines.
* BMP (BITMAPINFOHEADER): 24-bit uncompressed bottom-up BGR with 4-byte
  row padding.
* WAV: 16-bit PCM through the stdlib ``wave`` module.

These make operators/multimodal.py's decode step REAL for the formats a
training-data pipeline most commonly stores; JPEG/video stay declared
stubs (entropy coding / container demux genuinely need external codecs).

Per-scanline unfilter is sequential by specification (each pixel depends
on the left/up/up-left neighbors), so Sub/Average/Paeth run a per-pixel
loop — fine for the thumbnail-scale payloads a feature-extraction UDF
sees per row; swap in an imaging library for megapixel workloads.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(payload: bytes) -> str:
    """'png' | 'bmp' | 'wav' | 'unknown' from magic bytes."""
    b = bytes(payload[:12])
    if b.startswith(PNG_SIG):
        return "png"
    if b.startswith(b"BM"):
        return "bmp"
    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ------------------------------------------------------------------- PNG


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W, C). 8-bit depth, no interlace."""
    data = bytes(payload)
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = len(PNG_SIG), None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace}); supported: 8-bit gray/ga/rgb/rgba, "
            "non-interlaced"
        )
    c = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        row = raw[y * (stride + 1):(y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], np.uint8).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up: whole-row vector op
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth: sequential in x
            cur = line.copy()
            for x in range(stride):
                a = cur[x - c] if x >= c else 0          # left
                b = prev[x]                              # up
                if ftype == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    cc = prev[x - c] if x >= c else 0    # up-left
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else cc
                    )
                    cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C in {1,2,3,4}) -> PNG bytes (filter 0)."""
    arr = np.asarray(img, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------- BMP


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> uint8 array (H, W, 3) RGB."""
    data = bytes(payload)
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    hsize, w, h, planes, bpp, comp = struct.unpack("<IiihhI", data[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={comp})")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        data[offset:offset + stride * h], np.uint8
    ).reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB -> 24-bit bottom-up BMP bytes."""
    arr = np.asarray(img, np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + bytes(body)


# ------------------------------------------------------------------- WAV


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1] shaped (n, channels),
    sample_rate). 16-bit PCM."""
    with wave.open(io.BytesIO(bytes(payload))) as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"unsupported WAV width {f.getsampwidth()}")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        pcm = np.frombuffer(f.readframes(n), np.int16).reshape(-1, ch)
    return pcm.astype(np.float32) / 32768.0, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float32 (n,) or (n, channels) in [-1, 1] -> 16-bit PCM WAV bytes."""
    arr = np.asarray(samples, np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(arr * 32768.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(arr.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------- resize


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of (H, W[, C]) to (height, width[, C]) —
    the pixel-center index mapping every imaging library implements."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(int)
    xs = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(int)
    return img[ys][:, xs]
