"""Baseline JPEG codec in stdlib+numpy — the last common real-corpus
image format the sandbox can decode without a codec library.

Decoder (:func:`decode_jpeg`): marker walk (DQT/DHT/SOF0/DRI/SOS),
canonical Huffman decode with byte-stuffing and restart markers,
dequantize + de-zigzag, vectorized 8x8 IDCT (numpy basis multiply),
chroma upsampling and YCbCr→RGB. Scope is huffman-coded SEQUENTIAL
JPEG (SOF0/SOF1) with 8-bit samples and sampling factors 1 or 2 —
i.e. the baseline files ~every camera/web encoder emits (4:4:4,
4:2:2, 4:2:0, grayscale). Progressive (SOF2), arithmetic coding,
hierarchical and 12-bit input raise ``ValueError`` — which
:func:`.multimodal.decode_media` turns into an error ROW (a data
problem, not a configuration problem), exactly like truncated input.

Encoder (:func:`encode_jpeg`): the synthesis twin used by the gate
query and tests — flat quantization (all ones, the mildest legal
setting, so decode round-trips within ±2 of the source pixels),
standard Annex K Huffman tables, optional 2x2 chroma subsampling.

Everything here is the public ITU-T T.81 (1992) format; constants
(zigzag order, Annex K code tables) are spec values. Parity target:
the reference pipeline shipped page screenshots/media through S3 as
opaque bytes (crawler/src/utils/s3.py) — decoding them is the
capability this engine adds for multimodal training corpora.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag index: ZIGZAG[k] = natural (row-major) position of the k-th
#: coefficient in scan order (ITU-T T.81 Figure A.6)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K "typical" Huffman tables (ITU-T T.81 Tables K.3-K.6):
# (bits[1..16] code-length histogram, symbol values in code order)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """C[u, x] = c(u)/2 * cos((2x+1)u*pi/16) — spatial = C.T @ F @ C."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = np.full(8, 0.5)
    c[0] = 0.5 / np.sqrt(2.0)
    return c.reshape(8, 1) * np.cos((2 * x + 1) * u * np.pi / 16)


_BASIS = _dct_basis()


def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol → (code, length)) in canonical Huffman order."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """(fast, levels): ``fast`` is a 256-entry table mapping every
    8-bit prefix to (symbol, code_length) for codes of <= 8 bits
    (length 0 = miss → try ``levels``, the {length: {code: symbol}}
    maps for 9-16-bit codes)."""
    fast = [(0, 0)] * 256
    levels: dict[int, dict[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            # a corrupt DHT whose counts violate the Kraft inequality
            # would overflow the code space (and the fast table below)
            if code >= (1 << length):
                raise ValueError(
                    "corrupt JPEG: huffman table code overflow"
                )
            if length <= 8:
                base = code << (8 - length)
                for suffix in range(1 << (8 - length)):
                    fast[base | suffix] = (vals[k], length)
            else:
                levels.setdefault(length, {})[code] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return fast, levels


class _BitReader:
    """MSB-first reader over the entropy-coded segment: 0xFF00 is a
    stuffed data 0xFF, 0xFFD0-D7 are restart markers surfaced to the
    MCU loop, any other 0xFF marker ends the scan.

    Decode speed matters here — this loop IS the mapInPandas decode
    stage's CPU at corpus scale — so the reader keeps a bit
    accumulator that Huffman lookups PEEK into (one table probe per
    symbol for codes <= 8 bits, the overwhelmingly common case with
    the Annex K tables) instead of walking bit-by-bit. Past the end
    of the scan the accumulator is topped up with virtual zero bits
    so peeks never fail; CONSUMING one of those bits is the actual
    truncation error."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.pad = 0  # virtual bits (past scan end) at the BOTTOM of acc

    def _fill(self) -> None:
        data, pos = self.data, self.pos
        if self.pad == 0 and pos < len(data):
            b = data[pos]
            if b != 0xFF:
                self.pos = pos + 1
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
            nxt = data[pos + 1] if pos + 1 < len(data) else None
            if nxt == 0x00:  # stuffed data 0xFF
                self.pos = pos + 2
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            # any marker (restart or end-of-scan): stop consuming real
            # bytes; pos stays ON the marker for restart()
        self.acc <<= 8
        self.nbits += 8
        self.pad += 8

    def _take(self, n: int) -> int:
        if n > self.nbits - self.pad:
            raise ValueError("truncated JPEG scan: out of bits")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        return self._take(n)

    def huff(self, table) -> int:
        fast, levels = table
        while self.nbits < 16:
            self._fill()
        peek = (self.acc >> (self.nbits - 16)) & 0xFFFF
        sym, length = fast[peek >> 8]
        if length:
            self._take(length)
            return sym
        for ln in range(9, 17):
            level = levels.get(ln)
            if level is not None:
                sym = level.get(peek >> (16 - ln))
                if sym is not None:
                    self._take(ln)
                    return sym
        raise ValueError("corrupt JPEG: invalid huffman code")

    def restart(self) -> None:
        """Byte-align and consume an expected RSTn marker."""
        self.acc, self.nbits, self.pad = 0, 0, 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("corrupt JPEG: missing restart marker")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): size-bit magnitude → signed."""
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixel_bytes) from a baseline JPEG;
    rows top-down, channels 1 (grayscale) or 3 (RGB interleaved).
    Raises ValueError for corrupt, truncated, progressive or otherwise
    out-of-scope input — :func:`.multimodal.decode_media` turns that
    into an error row."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("corrupt media header: not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: lost marker sync")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                elif pq == 1:
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                if len(vals) != 64:
                    raise ValueError("truncated DQT")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = vals  # stored zigzag → natural order
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(
                    bits, vals
                )
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: huffman sequential
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF segment")
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG sample precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            comps = []
            if len(seg) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF segment")
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                hs, vs = hv >> 4, hv & 15
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(f"unsupported sampling {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "q": tq})
            if w == 0 or h == 0:
                raise ValueError(f"bad JPEG dimensions {w}x{h}")
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise ValueError("unsupported progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            if len(seg) < 1:
                raise ValueError("truncated JPEG SOS segment")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise ValueError("unsupported multi-scan JPEG")
            if len(seg) < 1 + 2 * ns:
                raise ValueError("truncated JPEG SOS segment")
            sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 15)
            scan = {"sel": sel, "start": pos + seglen}
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("truncated JPEG: missing SOF or SOS")

    comps = frame["comps"]
    if len(comps) == 1:
        # single-component scans are non-interleaved: the MCU is ONE
        # data unit regardless of declared sampling factors (T.81
        # A.2.2) — normalizing to 1x1 keeps the generic loop correct
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    # plausibility bound BEFORE allocating block storage: every data
    # unit costs at least 2 entropy bits (a 1-bit DC code + a 1-bit
    # EOB), so declared dimensions a corrupt SOF inflated past what
    # the payload could possibly encode fail here as a clean error
    # instead of a multi-GB np.zeros
    total_blocks = mcuy * mcux * sum(c["h"] * c["v"] for c in comps)
    scan_bits = 8 * max(0, len(data) - scan["start"])
    if 2 * total_blocks > scan_bits + 64:
        raise ValueError(
            "corrupt JPEG: declared dimensions exceed payload capacity"
        )
    for c in comps:
        if c["q"] not in qt:
            raise ValueError(f"corrupt JPEG: missing quant table {c['q']}")
        if c["id"] not in scan["sel"]:
            raise ValueError(
                "corrupt JPEG: scan references unknown component"
            )
        td, ta = scan["sel"][c["id"]]
        if td not in dc_tabs or ta not in ac_tabs:
            raise ValueError("corrupt JPEG: missing huffman table")
        c["dc"], c["ac"] = dc_tabs[td], ac_tabs[ta]
        c["qtab"] = qt[c["q"]]
        c["blocks"] = np.zeros(
            (mcuy * c["v"] * mcux * c["h"], 64), dtype=np.float64
        )
        c["pred"] = 0

    reader = _BitReader(data, scan["start"])
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                reader.restart()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                bw = mcux * c["h"]  # blocks per row for this component
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        t = reader.huff(c["dc"])
                        diff = _extend(reader.bits(t), t) if t else 0
                        c["pred"] += diff
                        coef[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = reader.huff(c["ac"])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC overrun")
                            coef[k] = _extend(reader.bits(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        nat = np.zeros(64, dtype=np.float64)
                        nat[ZIGZAG] = coef  # scan order → natural order
                        c["blocks"][row * bw + col] = nat * c["qtab"]
            nmcu += 1

    planes = []
    for c in comps:
        blocks = c["blocks"].reshape(-1, 8, 8)
        # IDCT all blocks at once: spatial = C.T @ F @ C, batched
        spatial = np.einsum("ux,nuv,vy->nxy", _BASIS, blocks, _BASIS)
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        bh, bw = mcuy * c["v"], mcux * c["h"]
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample subsampled chroma to full grid, then crop
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )
        planes.append(plane[: frame["h"], : frame["w"]])

    if len(planes) == 1:
        return frame["w"], frame["h"], 1, planes[0].tobytes()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return frame["w"], frame["h"], 3, rgb.tobytes()


#: encoder code tables are constants — built once, not per image
_ENC_DC_LUM = _canonical_codes(*_DC_LUM)
_ENC_AC_LUM = _canonical_codes(*_AC_LUM)
_ENC_DC_CHR = _canonical_codes(*_DC_CHR)
_ENC_AC_CHR = _canonical_codes(*_AC_CHR)


class _BitWriter:
    def __init__(self):
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
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _encode_block(
    writer: _BitWriter, block: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    """FDCT + flat-quantize + huffman-encode one 8x8 spatial block;
    returns the new DC predictor."""
    coefs = _BASIS @ (block - 128.0) @ _BASIS.T
    q = np.clip(np.round(coefs), -1023, 1023).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred

    def magnitude(v: int) -> tuple[int, int]:
        size = int(v).bit_length() if v >= 0 else int(-v).bit_length()
        return size, (v if v >= 0 else v + (1 << size) - 1)

    size, bits = magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zlen = ac_codes[0xF0]
            writer.write(zrl, zlen)
            run -= 16
        size, bits = magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last < 63:
        eob, elen = ac_codes[0x00]
        writer.write(eob, elen)
    return dc


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    subsample: int = 1,
) -> bytes:
    """Synthesize a baseline JPEG (SOF0, Annex K tables, flat all-ones
    quantization so decode round-trips within ±2). ``channels`` 1
    (grayscale) or 3 (RGB interleaved rows top-down); ``subsample`` 1
    (4:4:4) or 2 (4:2:0 — chroma average-pooled 2x2). The gate's
    synthesis twin of :func:`decode_jpeg`, not a general-purpose
    compressor (flat quantization barely compresses)."""
    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count {channels}")
    if subsample not in (1, 2) or (channels == 1 and subsample != 1):
        raise ValueError(f"bad subsample {subsample} for {channels}ch")
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8)
    if len(arr) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    arr = arr.reshape(height, width, channels).astype(np.float64)

    if channels == 1:
        planes = [arr[:, :, 0]]
        samps = [(1, 1)]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == 2:
            # pad to even then 2x2 average-pool the chroma planes
            def pool(p):
                ph = p[: (p.shape[0] // 2) * 2, : (p.shape[1] // 2) * 2]
                if ph.size == 0:  # 1-px wide/tall edge case: no pooling
                    return p
                return ph.reshape(
                    ph.shape[0] // 2, 2, ph.shape[1] // 2, 2
                ).mean(axis=(1, 3))

            cb, cr = pool(cb), pool(cr)
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(h for h, _ in samps)
    vmax = max(v for _, v in samps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    def blocks_of(plane: np.ndarray, hs: int, vs: int) -> np.ndarray:
        """(mcuy*vs, mcux*hs, 8, 8) edge-replicated block grid."""
        th, tw = mcuy * vs * 8, mcux * hs * 8
        padded = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        return padded.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3)

    grids = [blocks_of(p, h, v) for p, (h, v) in zip(planes, samps)]

    tables = [(_ENC_DC_LUM, _ENC_AC_LUM)] + [
        (_ENC_DC_CHR, _ENC_AC_CHR)
    ] * (channels - 1)

    writer = _BitWriter()
    preds = [0] * channels
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((hs, vs), grid) in enumerate(zip(samps, grids)):
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = _encode_block(
                            writer,
                            grid[my * vs + by, mx * hs + bx],
                            preds[ci],
                            *tables[ci],
                        )
    body = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # flat quant, id 0
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for i, (hs, vs) in enumerate(samps):
        sof += bytes([i + 1, hs << 4 | vs, 0])
    out += seg(0xC0, sof)
    dht_body = dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    if channels == 3:
        dht_body += dht(0, 1, _DC_CHR) + dht(1, 1, _AC_CHR)
    out += seg(0xC4, dht_body)
    sos = bytes([channels])
    for i in range(channels):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"
    return bytes(out)
