"""Baseline JPEG codec (r9) — stdlib + numpy, no external libraries.

Closes the last "partial" cell in the multimodal decode scope
(r8 verdict "What's missing" #1): JFIF/baseline sequential DCT
(SOF0), 8-bit, grayscale or YCbCr with arbitrary h×v sampling
factors (4:4:4 / 4:2:2 / 4:2:0 …), restart markers, byte stuffing.
Quantization AND Huffman tables are read from the stream (DQT/DHT),
so the decoder is table-driven and decodes third-party baseline
JPEGs, not just this module's encoder output. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise — ``codecs.decode_any``
routes those to the stub.

The encoder (test support, like encode_ppm/encode_bmp/encode_png) is
4:4:4 baseline with the public Annex-K quantization and Huffman
tables (ITU-T T.81), quality-scaled with the IJG curve. JPEG is
lossy: round-trip tests assert dimensions/channels exactly and pixel
content by PSNR, plus EXACT reconstruction for flat-color images
(a constant block is pure DC, which survives quantization).

Everything here derives from the public JPEG specification (ITU-T
T.81 / ISO 10918-1, Annex K for the example tables).
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: ZIGZAG[k] = raster index of the k-th coefficient.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K example quantization tables (encoder defaults; the decoder
# always uses the tables carried in the stream's DQT segments).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.float64,
)

# Annex K Huffman tables: (BITS counts for code lengths 1..16, values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II basis: block_dct = M @ block @ M.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_M = _C * np.sqrt(2.0 / 8.0)
_M[0, :] *= 1.0 / np.sqrt(2.0)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M


# --- Huffman machinery ------------------------------------------------------
def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman assignment → {value: (length, code)}."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Inverse map {(length, code): value} for bit-serial decoding."""
    return {
        (length, code): v for v, (length, code) in _build_codes(bits, vals).items()
    }


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment.

    Handles byte stuffing (FF 00 → FF) and stops at any real marker;
    RSTn markers are consumed by ``sync_restart``.
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartBoundary()
            else:
                raise ValueError(f"marker FF{nxt:02X} inside scan")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Drop partial bits and consume the RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        if (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _RestartBoundary(Exception):
    """Internal: the bit reader hit an RSTn while filling."""


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND (spec F.2.2.1): map t-bit magnitude to signed."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder ----------------------------------------------------------------
def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w) gray or (h, w, 3) RGB uint8 array."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.float64)
                raster = np.empty(64)
                raster[ZIGZAG] = tbl
                qt[tq] = raster.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decoder(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"{precision}-bit precision not supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline SOF FF{marker:02X} not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cs] = (tables >> 4, tables & 0x0F)
            return _decode_scan(
                payload, pos + seglen, frame, scan_sel, qt,
                huff_dc, huff_ac, restart_interval,
            )
        elif marker == 0xD9:  # EOI without scan
            raise ValueError("no scan data")
        pos += seglen
    raise ValueError("truncated JPEG")


def _decode_scan(data, pos, frame, scan_sel, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = []
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_sel[c["id"]]
                dct, act = huff_dc[td], huff_ac[ta]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        try:
                            t = reader.decode_symbol(dct)
                            diff = _extend(reader.read_bits(t), t)
                        except _RestartBoundary as exc:
                            raise ValueError(
                                "restart marker misaligned"
                            ) from exc
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = np.empty(64)
                        coef[ZIGZAG] = zz
                        block = _idct(coef.reshape(8, 8) * q) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # Upsample sampled-down components to full MCU-grid resolution.
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> dict:
    """JPEG → unified media-metadata dict (codecs.decode_any contract)."""
    px = decode_jpeg_pixels(payload)
    return {
        "codec": "jpeg",
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "n_channels": 1 if px.ndim == 2 else int(px.shape[2]),
        "sample_rate": None,
        "mean_value": float(px.mean()) if px.size else 0.0,
    }


# --- encoder (test support) --------------------------------------------------
def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg curve)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec


def _marker(mk: int, payload: bytes = b"") -> bytes:
    if payload:
        return struct.pack(">BBH", 0xFF, mk, len(payload) + 2) + payload
    return struct.pack(">BB", 0xFF, mk)


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coef = _fdct(block - 128.0)
    zz = np.round(coef.reshape(-1)[ZIGZAG] / q.reshape(-1)[ZIGZAG]).astype(
        np.int64
    )
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff != 0 else 0
    length, code = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if last_nz.size else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        length, code = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        length, code = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → baseline JPEG.

    ``subsample=True`` emits 4:2:0 (Y at 2×2 sampling, 2×2-mean
    chroma, 16×16 MCUs) so decoder tests cover the interleaved-MCU +
    upsampling path; default is 4:4:4.
    """
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    px = pixels.astype(np.float64)
    if gray:
        planes = [px]
    else:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    quants = [ql] + ([qc, qc] if not gray else [])
    sub = subsample and not gray
    # Per-component sampling factors (h, v).
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp[: len(planes)])
    vmax = max(s[1] for s in samp[: len(planes)])

    out = bytearray(b"\xff\xd8")  # SOI
    zz_l = ql.reshape(8, 8)[np.unravel_index(ZIGZAG, (8, 8))]
    out += _marker(0xDB, bytes([0x00]) + bytes(zz_l.astype(np.uint8)))
    if not gray:
        zz_c = qc.reshape(8, 8)[np.unravel_index(ZIGZAG, (8, 8))]
        out += _marker(0xDB, bytes([0x01]) + bytes(zz_c.astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        tq = 0 if cid == 1 else 1
        sh, sv = samp[cid - 1]
        sof += bytes([cid, (sh << 4) | sv, tq])
    out += _marker(0xC0, sof)
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    )[: 2 if gray else 4]:
        out += _marker(
            0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals)
        )
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    codes = [(dc_l, ac_l)] + ([(dc_c, ac_c)] * 2 if not gray else [])

    mcus_y = -(-h // (8 * vmax))
    mcus_x = -(-w // (8 * hmax))
    # Downsample chroma (2×2 mean) when subsampling, then pad every
    # plane to its own MCU-grid size by edge replication.
    comp_planes = []
    for ci, p in enumerate(planes):
        sh, sv = samp[ci]
        if sub and ci > 0:
            ph = -(-p.shape[0] // 2) * 2
            pw = -(-p.shape[1] // 2) * 2
            p2 = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
            )
            p = (
                p2[0::2, 0::2] + p2[1::2, 0::2]
                + p2[0::2, 1::2] + p2[1::2, 1::2]
            ) / 4.0
        th, tw = mcus_y * 8 * sv, mcus_x * 8 * sh
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        comp_planes.append(p)

    bw = _BitWriter()
    pred = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = comp_planes[ci][
                            y0 : y0 + 8, x0 : x0 + 8
                        ]
                        pred[ci] = _encode_block(
                            bw, block, quants[ci], codes[ci][0],
                            codes[ci][1], pred[ci],
                        )
    bw.flush()
    out += bw.out
    out += _marker(0xD9)  # EOI
    return bytes(out)
