"""Real media codecs for uncompressed container formats (r8).

The sandbox ships no image/audio libraries, but PPM (P6), BMP
(BITMAPINFOHEADER / 24-bit BI_RGB) and WAV (PCM16) are fully
decodable with the stdlib + numpy — so the multimodal pipeline's
decode step is a REAL decoder for those formats, and the deterministic
stub remains only for compressed codecs (JPEG/PNG/MP4) the container
genuinely cannot parse. Swapping in Pillow/ffmpeg later replaces
``decode_any``'s fallback branch without touching the mapInPandas
contract (operators/multimodal.py).

All decoders take raw ``bytes`` and return a plain dict with the
unified media schema:
    codec: 'ppm' | 'bmp' | 'wav' | 'stub'
    width, height: pixel dims (images; None for audio)
    n_channels: samples per pixel / audio channels
    sample_rate: audio frame rate (None for images)
    mean_value: mean sample value over all channels (float)
"""

from __future__ import annotations

import struct
import wave
from io import BytesIO

import numpy as np


def sniff(payload: bytes) -> str:
    """Magic-byte container detection."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse the P6 header (magic, width, height, maxval), skipping
    comments; returns (width, height, maxval, data_offset)."""
    tokens: list[bytes] = []
    i = 2  # past 'P6'
    while len(tokens) < 3:
        # skip whitespace
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to EOL
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    return w, h, maxval, i


def decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6): header + raw interleaved RGB."""
    w, h, maxval, off = _ppm_header(payload)
    if maxval >= 256:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
    return {
        "codec": "ppm",
        "width": w,
        "height": h,
        "n_channels": 3,
        "sample_rate": None,
        "mean_value": float(px.mean()) if n else 0.0,
    }


def decode_bmp(payload: bytes) -> dict:
    """Windows BMP, BITMAPINFOHEADER, 24-bit uncompressed (BI_RGB).

    Rows are bottom-up and padded to 4-byte boundaries — padding is
    excluded from the mean.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={compression}")
    height = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)[:, :row_bytes]
    return {
        "codec": "bmp",
        "width": w,
        "height": height,
        "n_channels": 3,
        "sample_rate": None,
        "mean_value": float(rows.mean()) if rows.size else 0.0,
    }


def decode_wav(payload: bytes) -> dict:
    """PCM WAV via the stdlib wave module; PCM16 samples → numpy."""
    with wave.open(BytesIO(payload), "rb") as wf:
        n_channels = wf.getnchannels()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        n_frames = wf.getnframes()
        raw = wf.readframes(n_frames)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    elif width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
    else:
        raise ValueError(f"unsupported sample width {width}")
    return {
        "codec": "wav",
        "width": n_frames,  # frames along the time axis
        "height": None,
        "n_channels": n_channels,
        "sample_rate": rate,
        "mean_value": float(np.abs(samples).mean()) if samples.size else 0.0,
    }


def decode_any(payload: bytes) -> dict:
    """Dispatch on magic bytes; unknown containers fall back to the
    deterministic stub (the documented scope limit for compressed
    codecs — JPEG/PNG/MP4 need libs this container does not ship)."""
    kind = sniff(payload)
    try:
        if kind == "ppm":
            return decode_ppm(payload)
        if kind == "bmp":
            return decode_bmp(payload)
        if kind == "wav":
            return decode_wav(payload)
    except Exception:  # noqa: BLE001 — corrupt media must not kill a batch
        pass
    return {
        "codec": "stub",
        "width": None,
        "height": None,
        "n_channels": None,
        "sample_rate": None,
        "mean_value": None,
    }


# --- test-support encoders (exact inverses of the decoders) ---------------
def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 (BGR, top-down in memory) → 24-bit BMP
    (bottom-up rows, 4-byte padded)."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    pad = b"\x00" * (stride - row_bytes)
    body = b"".join(
        pixels[r].astype(np.uint8).tobytes() + pad for r in range(h - 1, -1, -1)
    )
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def encode_wav(samples: np.ndarray, rate: int = 16_000, channels: int = 1) -> bytes:
    """int16 samples → PCM16 WAV bytes."""
    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()
