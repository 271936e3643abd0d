"""Baseline-sequential JPEG codec (ITU-T T.81, Annex K tables) —
stdlib + numpy ONLY, no codec library.

Decoder: baseline DCT (SOF0), 8-bit samples, 1- or 3-component scans,
sampling factors h,v ∈ {1,2} (4:4:4 / 4:2:2 / 4:2:0), restart markers,
batched-numpy dequant + IDCT (the bitstream walk is inherently serial).
Encoder: 4:4:4 or 4:2:0, Annex-K quantization (libjpeg-style quality
scaling) and Huffman tables.

Role: replaces the former NotImplementedError stub in ImageDecodeStage —
JPEG features are now computed from a REAL decode. (The reference routes
JPEG bytes through a type-specific filter slot, archive/pc_arc_filter.c:
71-125; here the type-specific stage feeds image features instead.)
"""

from __future__ import annotations

import numpy as np

# ---- Annex K.1 quantization tables (natural order) ----
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zigzag position -> natural (raster) index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# ---- Annex K.3 Huffman table specs: (bits[1..16], values) ----
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix: spatial = T.T @ coeff @ T
_T8 = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(1 / 8) if _k == 0 else 0.5
    _T8[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)


def _canonical_codes(bits, vals):
    """(value -> (code, length)) for a canonical JPEG Huffman spec."""
    codes = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


def _decode_map(bits, vals):
    """((length, code) -> symbol) lookup for decoding."""
    out = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[vi]
            code += 1
            vi += 1
        code <<= 1
    return out


# ---------------------------------------------------------------- decoder

class _BitReader:
    """MSB-first bit reader over unstuffed scan bytes."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: np.ndarray):
        self.bits = np.unpackbits(data)
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        bits = self.bits
        p = self.pos
        for _ in range(n):
            v = (v << 1) | int(bits[p])
            p += 1
        self.pos = p
        return v

    def huff_decode(self, table: dict) -> int:
        code = 0
        length = 0
        bits = self.bits
        p = self.pos
        while length < 16:
            code = (code << 1) | int(bits[p])
            p += 1
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                self.pos = p
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _unstuff(data: bytes):
    """scan bytes → (clean bytes, restart boundaries in clean coords)."""
    a = np.frombuffer(data, np.uint8)
    keep = np.ones(a.size, dtype=bool)
    bounds = []
    ff = np.flatnonzero(a == 0xFF)
    end = a.size
    for f in ff:
        if f + 1 >= a.size:
            end = min(end, int(f))
            break
        nxt = int(a[f + 1])
        if nxt == 0x00:
            keep[f + 1] = False
        elif 0xD0 <= nxt <= 0xD7:
            keep[f] = False
            keep[f + 1] = False
            bounds.append(int(f))
        else:  # real marker (EOI / next segment): scan ends here
            end = min(end, int(f))
            break
    keep[end:] = False
    clean_pos = np.cumsum(keep) - keep  # original idx -> clean idx
    clean = a[keep]
    rst = [int(clean_pos[b]) for b in bounds if b < end]
    return clean, rst


def decode_jpeg(payload: bytes):
    """Baseline JPEG → HxWx3 uint8 RGB array (grayscale replicated), or
    None if the payload is not a decodable baseline JPEG."""
    try:
        return _decode_jpeg(payload)
    except Exception:
        return None


def _decode_jpeg(payload: bytes):
    if payload[:2] != b"\xFF\xD8":
        return None
    pos = 2
    qts = {}
    huff = {}
    frame = None
    dri = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(payload[pos:pos + 2], "big")
        body = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                b += 1
                if pq:  # 16-bit table
                    q = np.frombuffer(body[b:b + 128], ">u2").astype(np.int32)
                    b += 128
                else:
                    q = np.frombuffer(body[b:b + 64], np.uint8).astype(np.int32)
                    b += 64
                qts[tq] = q  # zigzag order
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1:b + 17])
                nv = sum(bits)
                vals = list(body[b + 17:b + 17 + nv])
                huff[(tc, th)] = _decode_map(bits, vals)
                b += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            h, w = (int.from_bytes(body[1:3], "big"),
                    int.from_bytes(body[3:5], "big"))
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xDD:  # DRI
            dri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            data_start = pos + seglen
            return _decode_scan(payload[data_start:], frame, qts, huff,
                                scan, dri)
        pos += seglen
    return None


_MAX_PIXELS = 1 << 24   # 16M px: caps a corrupt SOF's dimension fields —
#                         without it a flipped byte demands GB allocations
#                         and a million-MCU Python loop before any entropy
#                         error can surface (fuzz-hardening)


def _decode_scan(data: bytes, frame, qts, huff, scan, dri):
    if frame is None:
        raise ValueError("SOS before SOF")
    H, W = frame["h"], frame["w"]
    if H * W > _MAX_PIXELS or H == 0 or W == 0:
        raise ValueError(f"unreasonable JPEG dimensions {W}x{H}")
    comps = frame["comps"]
    if not comps:
        raise ValueError("SOF with zero components")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0:
        raise ValueError("zero sampling factor")
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    for c, s in zip(order, scan):
        c["td"], c["ta"] = s["td"], s["ta"]
        c["bw"] = mcux * c["h"]        # blocks across
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0

    clean, rst_bounds = _unstuff(data)
    reader = _BitReader(clean)
    rst_bits = [b * 8 for b in rst_bounds]
    rst_i = 0

    zz = _ZIGZAG
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            # byte-align at the recorded restart boundary, reset predictors
            if rst_i < len(rst_bits):
                reader.pos = rst_bits[rst_i]
                rst_i += 1
            for c in order:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in order:
            dc_tab = huff[(0, c["td"])]
            ac_tab = huff[(1, c["ta"])]
            q = qts[c["tq"]]
            for byi in range(c["v"]):
                for bxi in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int32)
                    s = reader.huff_decode(dc_tab)
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    c["pred"] += diff
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = reader.huff_decode(ac_tab)
                        r, ssz = rs >> 4, rs & 0xF
                        if ssz == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflow")
                        blk[k] = _extend(reader.read_bits(ssz), ssz)
                        k += 1
                    row = my * c["v"] + byi
                    col = mx * c["h"] + bxi
                    c["coef"][row * c["bw"] + col] = blk * q

    # batched dezigzag + IDCT per component, then upsample + crop
    planes = []
    for c in order:
        nat = np.zeros_like(c["coef"])
        nat[:, zz] = c["coef"]
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ab,nbc,cd->nad", _T8.T, blocks, _T8) + 128.0
        plane = (spatial.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8))
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)[:H, :W]
        planes.append(plane)

    if len(planes) == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill

    def restart(self, i: int):
        """Byte-align and emit an unstuffed RSTn marker."""
        self.flush()
        self.out.extend(bytes([0xFF, 0xD0 + (i & 7)]))


def _quality_tables(quality: int):
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QT_LUMA * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QT_CHROMA * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _fdct_quant(plane: np.ndarray, q_natural: np.ndarray) -> np.ndarray:
    """plane (multiple-of-8 dims) → per-block zigzag-quantized int32."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    coef = np.einsum("ab,nbc,cd->nad", _T8, blocks, _T8.T)
    qn = q_natural.reshape(8, 8)
    quant = np.round(coef / qn).astype(np.int32).reshape(-1, 64)
    return quant[:, _ZIGZAG]  # natural -> zigzag


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = int(abs(diff)).bit_length()
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.flatnonzero(zz[1:]) + 1
    last = int(nz[-1]) if nz.size else 0
    k = 1
    while k <= last:
        v = int(zz[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        s = int(abs(v)).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        k += 1
    if last < 63:
        code, length = ac_codes[0x00]
        bw.write(code, length)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """HxWx3 (RGB) or HxW (grayscale) uint8 → baseline JPEG bytes.
    ``subsample=True`` emits 4:2:0 chroma, else 4:4:4.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (exercises the decoder's restart resync path)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    H, W = img.shape[:2]
    ql, qc = _quality_tables(quality)
    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    if gray:
        y = img.astype(np.float64)
        planes = [(_pad8(y), ql, dc_l, ac_l, 1, 1)]
        sof_comps = [(1, 1, 1, 0)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down2(p):
                h2, w2 = (p.shape[0] + 1) // 2, (p.shape[1] + 1) // 2
                pp = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                            mode="edge")
                return pp.reshape(h2, 2, w2, 2).mean(axis=(1, 3))

            cb, cr = down2(cb), down2(cr)
            hv_y, hv_c = (2, 2), (1, 1)
        else:
            hv_y, hv_c = (1, 1), (1, 1)
        planes = [(_pad8(y), ql, dc_l, ac_l, *hv_y),
                  (_pad8(cb), qc, dc_c, ac_c, *hv_c),
                  (_pad8(cr), qc, dc_c, ac_c, *hv_c)]
        sof_comps = [(1, hv_y[0], hv_y[1], 0),
                     (2, hv_c[0], hv_c[1], 1),
                     (3, hv_c[0], hv_c[1], 1)]

    hmax = max(p[4] for p in planes)
    vmax = max(p[5] for p in planes)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))

    # per-plane zigzag blocks, padded to the MCU grid
    enc = []
    for plane, q, dct, act, h, v in planes:
        need_h, need_w = mcuy * v * 8, mcux * h * 8
        plane = np.pad(plane, ((0, need_h - plane.shape[0]),
                               (0, need_w - plane.shape[1])), mode="edge")
        zzb = _fdct_quant(plane, q)  # tables are stored in natural order
        enc.append({"zz": zzb, "bw": need_w // 8, "dc": dct, "ac": act,
                    "h": h, "v": v, "pred": 0})

    bw = _BitWriter()
    rst_count = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.restart(rst_count)
            rst_count += 1
            for e in enc:
                e["pred"] = 0
        my, mx = divmod(m, mcux)
        for e in enc:
            for byi in range(e["v"]):
                for bxi in range(e["h"]):
                    row = my * e["v"] + byi
                    col = mx * e["h"] + bxi
                    e["pred"] = _encode_block(
                        bw, e["zz"][row * e["bw"] + col], e["pred"],
                        e["dc"], e["ac"])
    bw.flush()

    out = bytearray(b"\xFF\xD8")

    def seg(marker: int, body: bytes):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    seg(0xDB, bytes([0x00])
        + ql[_ZIGZAG_ORDER_FOR_TABLES].astype(np.uint8).tobytes())
    if not gray:
        seg(0xDB, bytes([0x01])
            + qc[_ZIGZAG_ORDER_FOR_TABLES].astype(np.uint8).tobytes())
    sof = bytearray([8]) + H.to_bytes(2, "big") + W.to_bytes(2, "big") \
        + bytes([len(sof_comps)])
    for cid, h, v, tq in sof_comps:
        sof += bytes([cid, (h << 4) | v, tq])
    seg(0xC0, bytes(sof))
    seg(0xC4, bytes([0x00] + _DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    seg(0xC4, bytes([0x10] + _AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
    if not gray:
        seg(0xC4, bytes([0x01] + _DC_CHROMA_BITS) + bytes(_DC_CHROMA_VALS))
        seg(0xC4, bytes([0x11] + _AC_CHROMA_BITS) + bytes(_AC_CHROMA_VALS))
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([len(sof_comps)])
    for i, (cid, _, _, _) in enumerate(sof_comps):
        sos += bytes([cid, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))
    out.extend(bw.out)
    out.extend(b"\xFF\xD9")
    return bytes(out)


_ZIGZAG_ORDER_FOR_TABLES = _ZIGZAG  # DQT bodies are written in zigzag order
