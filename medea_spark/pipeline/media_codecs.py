"""Real (library-free) media codecs: uncompressed BMP, PCM WAV, and PNG.

The multimodal plumbing (pipeline/multimodal.py) stubs formats whose
codecs genuinely need external libraries (JPEG/MP4), but three classic
formats need nothing beyond the stdlib:

* BMP (BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up, 4-byte row padding)
* WAV (RIFF / fmt / data, 16-bit PCM)
* PNG (8-bit truecolor RGB: zlib inflate + per-scanline unfilter —
  all five filter types 0-4, CRC-verified chunk walk)

so those decode for real: the parser walks the actual bytes, validates
magic/headers/CRCs, and reconstructs the pixel matrix / sample array.
The driver query (``media_decode``) stages generator-built blobs with
ground-truth columns and DuckDB compares the decoder's output against
the ground truth — an honest bytes-in/metadata-out differential, not a
fake.

Everything here is pure Python/NumPy over ``bytes``: it runs inside
Arrow batches on executors, no JVM involvement, no external library.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

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


# ---------------------------------------------------------------------------
# PNG (8-bit truecolor, non-interlaced) — pure stdlib zlib + filter math
# ---------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # bytes per pixel: 8-bit RGB


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth_predictor(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Vectorized Paeth (PNG spec §9.4): nearest of left/up/upleft to
    left+up-upleft, ties broken left → up → upleft."""
    p = left + up - upleft
    pa = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - upleft)
    return np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → non-interlaced 8-bit truecolor PNG bytes.

    Each scanline uses filter type ``row % 5`` — deliberately cycling
    through None/Sub/Up/Average/Paeth so any decoder consuming these
    blobs (including ours) must implement the full unfilter set, not
    just the trivial filter-0 path.
    """
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # depth 8, color 2 (RGB)
    raw = pixels.reshape(h, w * _PNG_BPP).astype(np.int16)
    zeros = np.zeros(w * _PNG_BPP, dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        prev = raw[y - 1] if y else zeros
        left = np.concatenate([zeros[:_PNG_BPP], cur[:-_PNG_BPP]])
        upleft = np.concatenate([zeros[:_PNG_BPP], prev[:-_PNG_BPP]])
        ftype = y % 5
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - (left + prev) // 2
        else:
            filt = cur - _paeth_predictor(left, prev, upleft)
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
    idat = zlib.compress(b"".join(lines), 6)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(ftype: int, cur: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """One scanline: filtered bytes → reconstructed bytes (uint8).
    ``prev`` is the already-reconstructed previous scanline."""
    if ftype == 0:
        return cur.copy()
    if ftype == 2:  # Up: element-wise, fully vectorized
        return (cur.astype(np.uint16) + prev).astype(np.uint8)
    if ftype == 1:  # Sub: recon[i] = filt[i] + recon[i-bpp] — a per-channel
        # prefix sum (mod 256 commutes with addition), so cumsum vectorizes it
        acc = np.cumsum(cur.reshape(-1, _PNG_BPP), axis=0, dtype=np.int64)
        return (acc % 256).astype(np.uint8).reshape(-1)
    # Average / Paeth depend on the reconstructed left neighbor —
    # inherently sequential per pixel; loop over pixels (3-wide vectors)
    out = np.zeros_like(cur)
    zeros3 = np.zeros(_PNG_BPP, dtype=np.int32)
    for i in range(0, len(cur), _PNG_BPP):
        left = out[i - _PNG_BPP : i].astype(np.int32) if i else zeros3
        up = prev[i : i + _PNG_BPP].astype(np.int32)
        if ftype == 3:
            pred = (left + up) // 2
        elif ftype == 4:
            upleft = prev[i - _PNG_BPP : i].astype(np.int32) if i else zeros3
            pred = _paeth_predictor(left, up, upleft)
        else:
            raise MediaDecodeError(f"bad PNG filter type {ftype}")
        out[i : i + _PNG_BPP] = ((cur[i : i + _PNG_BPP] + pred) % 256).astype(np.uint8)
    return out


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB.

    Supports the format this engine's ground-truth encoder and the vast
    majority of ML-corpus screenshots use: 8-bit truecolor (color type
    2), non-interlaced.  Anything else — palette, alpha, 16-bit,
    Adam7 — raises MediaDecodeError rather than silently guessing.
    Every chunk CRC is verified; trailing garbage after IEND is
    rejected; the inflated stream must match h*(1+w*3) exactly.
    """
    if len(blob) < len(PNG_SIGNATURE) or blob[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise MediaDecodeError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    ihdr = None
    idat_parts: list[bytes] = []
    seen_end = False
    while pos < len(blob):
        if seen_end:
            raise MediaDecodeError("data after IEND")
        if pos + 8 > len(blob):
            raise MediaDecodeError("truncated chunk header")
        (clen,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + clen]
        if len(body) < clen or pos + 12 + clen > len(blob):
            raise MediaDecodeError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + clen : pos + 12 + clen])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise MediaDecodeError(f"bad CRC on {ctype!r} chunk")
        if ctype == b"IHDR":
            if ihdr is not None:
                raise MediaDecodeError("duplicate IHDR")
            ihdr = body
        elif ctype == b"IDAT":
            if ihdr is None:
                raise MediaDecodeError("IDAT before IHDR")
            idat_parts.append(body)
        elif ctype == b"IEND":
            seen_end = True
        elif not (ctype[0] & 0x20):  # critical chunk we don't know (e.g. PLTE
            # for a truecolor image is ancillary-in-effect, but its flag bit
            # says critical only for color type 3 — we reject unknown critical)
            raise MediaDecodeError(f"unsupported critical chunk {ctype!r}")
        pos += 12 + clen
    if ihdr is None or not seen_end:
        raise MediaDecodeError("missing IHDR/IEND")
    if len(ihdr) != 13:
        raise MediaDecodeError("bad IHDR length")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color != 2:
        raise MediaDecodeError(f"unsupported PNG (depth={depth}, color_type={color})")
    if comp != 0 or filt != 0 or interlace != 0:
        raise MediaDecodeError("unsupported compression/filter/interlace method")
    if w == 0 or h == 0 or w > 1 << 24 or h > 1 << 24:
        raise MediaDecodeError("bad dimensions")
    if not idat_parts:
        raise MediaDecodeError("no IDAT data")
    try:
        stream = zlib.decompress(b"".join(idat_parts))
    except zlib.error as exc:
        raise MediaDecodeError(f"bad zlib stream: {exc}") from exc
    stride = w * _PNG_BPP
    if len(stream) != h * (1 + stride):
        raise MediaDecodeError("inflated size does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = y * (1 + stride)
        ftype = stream[base]
        if ftype > 4:
            raise MediaDecodeError(f"bad PNG filter type {ftype}")
        cur = np.frombuffer(stream, dtype=np.uint8, count=stride, offset=base + 1)
        prev = _png_unfilter(ftype, cur, prev)
        out[y] = prev
    return out.reshape(h, w, _PNG_BPP)


def pixel_sha256(pixels: np.ndarray) -> str:
    """Canonical content hash of a decoded image: sha256 of the
    row-major RGB bytes (layout-independent of the container)."""
    return hashlib.sha256(np.ascontiguousarray(pixels).tobytes()).hexdigest()


def pcm_sha256(samples: np.ndarray) -> str:
    """Canonical content hash of decoded audio: sha256 of the
    little-endian int16 sample bytes."""
    return hashlib.sha256(samples.astype("<i2").tobytes()).hexdigest()
