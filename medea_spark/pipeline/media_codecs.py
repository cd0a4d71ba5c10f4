"""Real (library-free) media codecs: uncompressed BMP and PCM WAV.

The multimodal plumbing (pipeline/multimodal.py) stubs compressed
formats — this container ships no JPEG/PNG/MP4 codecs — but the two
classic CONTAINER-ONLY formats need nothing beyond ``struct``:

* BMP (BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up, 4-byte row padding)
* WAV (RIFF / fmt / data, 16-bit PCM)

so those decode for real: the parser walks the actual bytes, validates
magic/headers, and reconstructs the pixel matrix / sample array.  The
driver query (``media_decode``) stages generator-built blobs with
ground-truth columns and DuckDB compares the decoder's output against
the ground truth — an honest bytes-in/metadata-out differential, not a
fake.

Everything here is pure Python/NumPy over ``bytes``: it runs inside
Arrow batches on executors, no JVM involvement, no external library.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class MediaDecodeError(ValueError):
    """Raised on malformed/truncated blobs — callers map this to an
    error row rather than letting one bad blob kill a 100 TB job."""


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB bottom-up BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        # BMP stores BGR
        rows.append(pixels[y, :, ::-1].tobytes() + pad)
    return header + dib + b"".join(rows)


def decode_bmp(blob: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB; raises MediaDecodeError on
    anything that is not a well-formed 24-bit BI_RGB bitmap."""
    if len(blob) < 54:
        raise MediaDecodeError("truncated BMP header")
    magic, _size, _r1, _r2, offset = struct.unpack("<2sIHHI", blob[:14])
    if magic != b"BM":
        raise MediaDecodeError("not a BMP (bad magic)")
    hdr_size, w, h, planes, bpp, compression = struct.unpack("<IiiHHI", blob[14:34])
    if hdr_size < 40 or planes != 1:
        raise MediaDecodeError("unsupported DIB header")
    if bpp != 24 or compression != 0:
        raise MediaDecodeError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    if w <= 0 or h == 0:
        raise MediaDecodeError("bad dimensions")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if len(blob) < offset + row_size * h:
        raise MediaDecodeError("truncated BMP pixel data")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        start = offset + i * row_size
        row = np.frombuffer(blob, dtype=np.uint8, count=w * 3, offset=start).reshape(
            w, 3
        )
        y = (h - 1 - i) if bottom_up else i
        out[y] = row[:, ::-1]  # BGR → RGB
    return out


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the deterministic, library-free
    resize; box/bilinear would need no extra deps either, but nearest
    is exactly reproducible across platforms)."""
    h, w, _ = pixels.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return pixels[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV (16-bit PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 → RIFF/WAVE 16-bit PCM bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,
        ch,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data_chunk), b"WAVE")
    return riff + fmt + data_chunk


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, channels) int16 samples, sample_rate); raises
    MediaDecodeError on malformed/unsupported (non-PCM-16) input."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid, clen = struct.unpack("<4sI", blob[pos : pos + 8])
        body = blob[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise MediaDecodeError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    audio_fmt, ch, rate, _brate, block_align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16:
        raise MediaDecodeError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    if ch < 1 or block_align != ch * 2:
        raise MediaDecodeError("bad channel/block-align")
    n = len(data) // block_align
    samples = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return samples, rate


def pixel_sha256(pixels: np.ndarray) -> str:
    """Canonical content hash of a decoded image: sha256 of the
    row-major RGB bytes (layout-independent of the container)."""
    return hashlib.sha256(np.ascontiguousarray(pixels).tobytes()).hexdigest()


def pcm_sha256(samples: np.ndarray) -> str:
    """Canonical content hash of decoded audio: sha256 of the
    little-endian int16 sample bytes."""
    return hashlib.sha256(samples.astype("<i2").tobytes()).hexdigest()
