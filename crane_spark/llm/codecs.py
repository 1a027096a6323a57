"""Dependency-free multimodal codecs: BMP / PPM / PGM images and
WAV-PCM audio, pure Python + NumPy.

These are the REAL decoders behind `llm.multimodal`'s `fake=False`
path (the container has no PIL/ffmpeg; these formats need none). Each
decoder parses the actual container format — headers, alignment,
channel order — and returns typed NumPy arrays; each encoder writes a
spec-conformant file that external tools (and Python's stdlib `wave`
module, used as the independent oracle in tests) can read back.

Supported:
  * BMP: uncompressed 24-bit BI_RGB (BITMAPINFOHEADER), bottom-up or
    top-down row order, 4-byte-aligned rows (the overwhelmingly common
    on-disk layout).
  * PPM (P6) / PGM (P5): binary netpbm, maxval <= 255.
  * WAV: RIFF/WAVE, PCM (format 1) 8-bit unsigned or 16-bit signed,
    any channel count / sample rate.

Everything operates on in-memory `bytes` — the unit that flows through
an Arrow batch in `mapInPandas` — never file handles, so the decode
stage stays a pure function over the binary column.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# --------------------------------------------------------------------
# sniffing


def sniff(data: bytes) -> str | None:
    """Best-effort container detection from magic bytes: 'bmp', 'ppm',
    'pgm', 'wav', or None for anything unrecognized."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"P5":
        return "pgm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# --------------------------------------------------------------------
# decoded representations


@dataclass
class DecodedImage:
    """Pixels as (height, width, channels) uint8; channels is 1 (gray)
    or 3 (RGB, in RGB order regardless of container byte order)."""

    pixels: np.ndarray
    fmt: str

    @property
    def height(self) -> int:
        return self.pixels.shape[0]

    @property
    def width(self) -> int:
        return self.pixels.shape[1]

    @property
    def channels(self) -> int:
        return self.pixels.shape[2]


@dataclass
class DecodedAudio:
    """Samples as (n_frames, channels) float64 normalized to [-1, 1]."""

    samples: np.ndarray
    sample_rate: int
    fmt: str

    @property
    def n_frames(self) -> int:
        return self.samples.shape[0]

    @property
    def channels(self) -> int:
        return self.samples.shape[1]


# --------------------------------------------------------------------
# BMP (24-bit uncompressed)


def decode_bmp(data: bytes) -> DecodedImage:
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp != 24:
        raise ValueError(f"unsupported BMP bit depth {bpp} (only 24)")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = pixel_offset + row_bytes * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * height, offset=pixel_offset)
    rows = raw.reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    # BMP stores BGR; flip to RGB
    return DecodedImage(pixels=np.ascontiguousarray(rows[:, :, ::-1]), fmt="bmp")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) or (h, w, 1) uint8 to 24-bit bottom-up BMP."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    if pixels.shape[2] == 1:
        pixels = np.repeat(pixels, 3, axis=2)
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    bgr = pixels[::-1, :, ::-1]  # bottom-up, RGB -> BGR
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + rows.tobytes()


# --------------------------------------------------------------------
# netpbm (P6 / P5 binary)


def _pnm_header(data: bytes, magic: bytes) -> tuple[int, int, int, int]:
    """Parse 'P6/P5 <w> <h> <maxval>' allowing comments/whitespace;
    returns (width, height, maxval, pixel_data_offset)."""
    if data[:2] != magic:
        raise ValueError(f"not a {magic.decode()} file")
    fields: list[int] = []
    i = 2
    n = len(data)
    while len(fields) < 3:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":  # comment to end of line
            while i < n and data[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated netpbm header")
        fields.append(int(data[i:j]))
        i = j
    return fields[0], fields[1], fields[2], i + 1  # single ws after maxval


def decode_ppm(data: bytes) -> DecodedImage:
    w, h, maxval, off = _pnm_header(data, b"P6")
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = off + w * h * 3
    if len(data) < need:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=off)
    return DecodedImage(pixels=px.reshape(h, w, 3).copy(), fmt="ppm")


def decode_pgm(data: bytes) -> DecodedImage:
    w, h, maxval, off = _pnm_header(data, b"P5")
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    need = off + w * h
    if len(data) < need:
        raise ValueError("truncated PGM pixel data")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h, offset=off)
    return DecodedImage(pixels=px.reshape(h, w, 1).copy(), fmt="pgm")


def encode_ppm(pixels: np.ndarray) -> bytes:
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    if pixels.shape[2] == 1:
        pixels = np.repeat(pixels, 3, axis=2)
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def encode_pgm(pixels: np.ndarray) -> bytes:
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 3:
        pixels = pixels.mean(axis=2).astype(np.uint8)
    h, w = pixels.shape
    return b"P5\n%d %d\n255\n" % (w, h) + pixels.tobytes()


# --------------------------------------------------------------------
# WAV (RIFF PCM)


def decode_wav(data: bytes) -> DecodedAudio:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # chunks pad to even sizes
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"unsupported WAV format {audio_fmt} (PCM only)")
    if bits == 16:
        raw = np.frombuffer(frames, dtype="<i2")
        samples = raw.astype(np.float64) / 32768.0
    elif bits == 8:
        raw = np.frombuffer(frames, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    n = len(samples) // channels
    return DecodedAudio(
        samples=samples[: n * channels].reshape(n, channels),
        sample_rate=rate,
        fmt="wav",
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (n, channels) float64 in [-1, 1] to 16-bit PCM WAV."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    channels = pcm.shape[1]
    data = pcm.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
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


# --------------------------------------------------------------------
# unified entry

_IMAGE_DECODERS = {"bmp": decode_bmp, "ppm": decode_ppm, "pgm": decode_pgm}


def decode_asset(data: bytes) -> DecodedImage | DecodedAudio:
    """Sniff + decode; raises ValueError on unknown/unsupported input.
    This is the single dispatch the multimodal operators call per
    asset inside an Arrow batch."""
    kind = sniff(data)
    if kind in _IMAGE_DECODERS:
        return _IMAGE_DECODERS[kind](data)
    if kind == "wav":
        return decode_wav(data)
    raise ValueError(
        "unrecognized asset container (supported: 24-bit BMP, binary "
        "PPM/PGM, PCM WAV)"
    )


def encode_like(decoded: DecodedImage | DecodedAudio) -> bytes:
    """Re-encode a decoded asset in its ORIGINAL container format —
    the second half of a decode -> transform -> re-encode stage."""
    if isinstance(decoded, DecodedImage):
        if decoded.fmt == "bmp":
            return encode_bmp(decoded.pixels)
        if decoded.fmt == "ppm":
            return encode_ppm(decoded.pixels)
        return encode_pgm(decoded.pixels[:, :, 0])
    return encode_wav(decoded.samples, decoded.sample_rate)
