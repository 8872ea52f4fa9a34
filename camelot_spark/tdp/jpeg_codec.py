"""Pure-stdlib baseline JPEG codec (ITU-T.81 sequential DCT, numpy):
the zero-dependency real-decode path behind ``multimodal.decode_image``
for JPEG containers, completing what ``png_codec`` did for PNG.

Decoder: generic marker parse (SOI/APPn/DQT/SOF0/DHT/DRI/SOS), Huffman
tables and quant tables read FROM THE FILE (so real-world baseline
JPEGs decode, not just our own), byte-unstuffing, restart-marker
resync, differential DC + run-length AC entropy decode, dequantize,
exact 8x8 IDCT via a precomputed orthonormal DCT matrix, and JFIF
YCbCr→RGB for 3-component 4:4:4 scans. Progressive (SOF2) and
subsampled scans raise NotImplementedError — PIL, when installed,
takes priority in ``decode_image`` and covers those.

Encoder (the in-test payload generator): grayscale or 4:4:4 YCbCr,
quality-scaled quant table, and — deliberately — canonical Huffman
tables GENERATED programmatically (all DC categories at one code
length, all 162 AC symbols at another). Any table satisfying Kraft is
a valid baseline table and the decoder reads whatever DHT declares, so
this trades a few percent of compression for not embedding the long
Annex-K constant blocks. JPEG is lossy: round-trip tests assert a
pixel tolerance, not equality.

Scale note: like the PNG path, decode runs inside Arrow-batched
``mapInPandas`` workers — per-image cost stays executor-local; the
block DCT/IDCT and dequantization are numpy matrix ops, the entropy
scan is the inherently sequential part (same trade PIL makes in C).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# orthonormal 8x8 DCT-II matrix: block_coeffs = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5)

# zigzag scan order, generated: index z -> (row, col)
_ZIGZAG = sorted(((r, c) for r in range(8) for c in range(8)),
                 key=lambda rc: (rc[0] + rc[1],
                                 rc[1] if (rc[0] + rc[1]) % 2 else rc[0]))
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])


def _quant_table(quality: int, chroma: bool) -> np.ndarray:
    """Deterministic frequency-ramp quant table scaled by quality
    (1-100). The decoder reads DQT from the file, so any table works;
    a ramp keeps low frequencies fine and high frequencies coarse."""
    scale = (5000 / quality if quality < 50 else 200 - 2 * quality) / 100.0
    base = 1 + (np.add.outer(np.arange(8), np.arange(8)) *
                (4.0 if chroma else 2.5)) + (8.0 if chroma else 4.0)
    q = np.clip(np.round(base * max(scale, 0.02)), 1, 255)
    return q.astype(np.int32)


# -- canonical Huffman tables (encoder side) ---------------------------

def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (bits-per-length, value list) -> {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _flat_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    """All symbols at one code length — valid iff len(symbols) < 2**length
    (strict: keeps the all-ones code unused, as common practice)."""
    assert len(symbols) < (1 << length)
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


_DC_SYMBOLS = list(range(12))                       # size categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [r * 16 + s for r in range(16)
                              for s in range(1, 11)]  # EOB, ZRL, (run,size)
_DC_BITS, _DC_VALS = _flat_table(_DC_SYMBOLS, 4)
_AC_BITS, _AC_VALS = _flat_table(_AC_SYMBOLS, 9)
_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s per spec (use 0111..)

    def restart(self, idx: int):
        """Byte-align and emit RSTn (no stuffing after the marker)."""
        self.flush()
        self.buf.append(0xFF)
        self.buf.append(0xD0 + (idx % 8))


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(w: _BitWriter, coeffs: np.ndarray, prev_dc: int) -> int:
    """Zigzagged int coeff vector (64,) -> entropy-coded bits."""
    dc = int(coeffs[0])
    diff = dc - prev_dc
    s = _category(diff)
    code, ln = _DC_ENC[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if k > last_nz:
            code, ln = _AC_ENC[0x00]  # EOB
            w.put(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_ENC[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_ENC[run * 16 + s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc_th] + bits + vals)


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG bytes from a (h, w) grayscale or (h, w, 3) RGB
    uint8 array (4:4:4, no subsampling). ``restart_interval`` > 0 emits
    a DRI segment and an RSTn marker every that many MCUs (DC
    predictors reset, stream byte-aligned) — exercises the decoder's
    resync path."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        comps = [y, cb, cr]
    ql = _quant_table(quality, chroma=False)
    qc = _quant_table(quality, chroma=True)
    qts = [ql] if gray else [ql, qc]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qts):
        out += _seg(0xDB, bytes([i]) + bytes(int(q[_ZZ_ROWS[z], _ZZ_COLS[z]])
                                             for z in range(64)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else (0 if gray else 1)])
    out += _seg(0xC0, sof)  # SOF0 baseline
    out += _seg(0xC4, _dht_payload(0x00, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, _dht_payload(0x10, _AC_BITS, _AC_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(bytes([c + 1, 0x00]) for c in range(nc)) \
        + bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bh, bw = -(-h // 8), -(-w // 8)
    padded = []
    for comp in comps:
        p = np.empty((bh * 8, bw * 8))
        p[:h, :w] = comp
        p[h:, :w] = comp[h - 1:h, :]  # edge-replicate pad
        p[:, w:] = p[:, w - 1:w]
        padded.append(p - 128.0)
    writer = _BitWriter()
    prev_dc = [0] * len(comps)
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.restart(rst)
                rst += 1
                prev_dc = [0] * len(comps)
            mcu += 1
            for ci, p in enumerate(padded):
                block = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _C @ block @ _C.T
                q = qts[0] if ci == 0 else qts[-1]
                zz = np.round(coef / q).astype(np.int64)[_ZZ_ROWS, _ZZ_COLS]
                prev_dc[ci] = _encode_block(writer, zz, prev_dc[ci])
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------

class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing and RST resync."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        while self.n <= 24:
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # RSTn, EOI, or next segment: do NOT consume — feed
                    # padding bits only. Consuming an RSTn here (during
                    # bit lookahead at the end of a restart interval)
                    # would make align_restart skip to the NEXT marker
                    # and silently drop a whole interval of MCUs.
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def align_restart(self):
        """Drop to a byte boundary and consume one RSTn marker."""
        self.n = 0
        self.acc = 0
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bits(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(h, w) uint8 for grayscale scans, (h, w, 3) RGB for color."""
    if payload[:3] != JPEG_MAGIC[:3] or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # 0xFF fill bytes are legal padding between segments (T.81
        # B.1.1.2): a run of 0xFF collapses to one marker prefix
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM/RSTn are standalone (length-less) markers
            pos += 2
            continue
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros((8, 8), dtype=np.int32)
                t[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    body[o + 1:o + 65], dtype=np.uint8)
                qts[tq] = t
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1:o + 17])
                nvals = sum(bits)
                vals = list(body[o + 17:o + 17 + nvals])
                enc = _canonical_codes(bits, vals)
                huff[(tc, th)] = {(ln_, code): sym
                                  for sym, (code, ln_) in enc.items()}
                o += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + c * 3:9 + c * 3]
                if samp != 0x11:
                    raise NotImplementedError("subsampled JPEG needs PIL")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise NotImplementedError("non-baseline (progressive/…) JPEG needs PIL")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            return _decode_scan(payload, pos, frame, scan, qts, huff,
                                restart_interval)
        # APPn/COM/etc: skipped
    raise ValueError("no SOS segment found")


def _decode_scan(payload, pos, frame, scan, qts, huff, restart_interval):
    h, w, comps = frame
    comp_tq = dict(comps)
    reader = _BitReader(payload, pos)
    bh, bw = -(-h // 8), -(-w // 8)
    planes = [np.zeros((bh * 8, bw * 8)) for _ in scan]
    prev_dc = [0] * len(scan)
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.align_restart()
                prev_dc = [0] * len(scan)
            for ci, (cid, tsel) in enumerate(scan):
                dc_tbl = huff[(0, tsel >> 4)]
                ac_tbl = huff[(1, tsel & 0x0F)]
                s = _huff_decode(reader, dc_tbl)
                diff = _extend(reader.bits(s), s) if s else 0
                prev_dc[ci] += diff
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = _huff_decode(reader, ac_tbl)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    size = rs & 0x0F
                    if k > 63:
                        raise ValueError("AC index overrun")
                    zz[k] = _extend(reader.bits(size), size)
                    k += 1
                q = qts[comp_tq[cid]]
                coef = np.zeros((8, 8))
                coef[_ZZ_ROWS, _ZZ_COLS] = zz
                block = _C.T @ (coef * q) @ _C + 128.0
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
            mcu += 1
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
