"""REAL baseline JPEG codec — pure Python/numpy, spec-compliant subset.

The container has no image libraries, but JPEG's baseline mode
(ITU T.81 / JFIF, SOF0) is implementable from first principles:
Huffman entropy coding, zigzag run-length, quantization, and the 8x8
DCT are all just arithmetic. This module implements both directions
for the subset:

- baseline sequential (SOF0), 8-bit precision
- 1 (grayscale) or 3 (YCbCr 4:4:4, i.e. no chroma subsampling)
  components
- no progressive mode, no restart markers, no arithmetic coding
  (all raise ValueError with the reason)

Two deliberate design choices keep it honest and verifiable:

1. **Our own canonical Huffman tables.** Every JPEG carries its
   Huffman tables in DHT segments, so an encoder may use ANY valid
   canonical code — ours assigns the 12 DC categories length-5 codes
   and the 256 AC (run, size) symbols 128 length-8 + 128 length-9
   codes (DHT's per-length counts are single bytes, and the last
   code 0b101111111 is not all-ones, which T.81 forbids).
   Compression is mediocre and irrelevant; correctness of the FORMAT
   is total: the decoder reconstructs whatever canonical tables the
   DHT declares, so it also reads files using the Annex K tables.

2. **Exactly-representable coefficients for oracles.** Quantization
   is the only lossy step. ``encode_gray_from_coeffs`` builds a real
   JPEG directly from QUANTIZED coefficients, so decoding recovers
   coeff*Q exactly and the pixel output is the pure closed form
   ``clip(round(IDCT(K*Q)) + 128)`` — recomputable in SQL with cos()
   (q168's arithmetic oracle pins the whole Huffman->dequant->IDCT
   pipeline to the bit).

The 2-D DCT used is the orthonormal 8-point DCT-II matrix sandwich
``M @ B @ M.T``, which equals T.81's (1/4)c(u)c(v) double-cosine
definition exactly (the s_u*s_v scale factors multiply out to the
same 1/8, 1/(4*sqrt 2), 1/4 triangle).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag, quant tables, our canonical Huffman specs
# ---------------------------------------------------------------------------


def _zigzag_order() -> list[tuple[int, int]]:
    """The standard JPEG zigzag scan, generated (not memorized):
    anti-diagonals, alternating direction, starting up-right."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - j, j) for j in rng]
        out.extend(diag if s % 2 else diag[::-1])
    return out


ZIGZAG = _zigzag_order()

#: deterministic quant tables (embedded in DQT, so any values are
#: format-legal; these roughly track Annex K's low-frequency emphasis)
QUANT_LUMA = np.array(
    [[16 + 2 * (i + j) for j in range(8)] for i in range(8)], np.int32
)
QUANT_CHROMA = np.array(
    [[17 + 3 * (i + j) for j in range(8)] for i in range(8)], np.int32
)

#: (bits-per-length list[16], symbol list) for our canonical codes.
#: DHT stores per-length counts as single BYTES, so the 256 AC symbols
#: split 128 at length 8 + 128 at length 9 (last code 0b101111111,
#: not the forbidden all-ones); the 12 DC categories sit at length 5.
_DC_SPEC = ([0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _canonical_codes(bits, vals):
    """DHT canonical reconstruction (T.81 C.2): symbols in order get
    increasing codes, code length stepping with the bits table."""
    codes, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DCT_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _DCT_M[_u, _x] = np.sqrt((1 if _u else 0.5) / 4.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16.0
        )


def dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def idct2(coeff: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coeff @ _DCT_M


# ---------------------------------------------------------------------------
# bit IO with 0xFF byte stuffing
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = r.bits(size)
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------
def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dqt(tid: int, table: np.ndarray) -> bytes:
    z = bytes(int(table[i, j]) for i, j in ZIGZAG)
    return _seg(0xFFDB, bytes([tid]) + z)


def _dht(tclass: int, tid: int, spec) -> bytes:
    bits, vals = spec
    return _seg(
        0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    )


def _encode_block(
    w: _BitWriter, qcoef: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    """Entropy-encode one quantized 8x8 block; returns the new DC
    predictor."""
    zz = [int(qcoef[i, j]) for i, j in ZIGZAG]
    dc, acs = zz[0], zz[1:]
    diff = dc - pred
    cat = _category(diff)
    if cat > 11:
        raise ValueError(
            f"DC difference {diff} exceeds baseline category 11"
        )
    if acs and _category(max(acs, key=abs)) > 10:
        # T.81 baseline caps AC size at 10; a larger magnitude would
        # alias into the (run, size) symbol arithmetic and emit a
        # silently corrupt scan
        raise ValueError("AC coefficient exceeds baseline size 10")
    code, length = dc_codes[cat]
    w.put(code, length)
    if cat:
        w.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = max((k for k, v in enumerate(acs) if v), default=-1)
    for k in range(last_nz + 1):
        v = acs[k]
        if v == 0:
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]  # ZRL
                w.put(code, length)
                run = 0
            continue
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        w.put(code, length)
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 62:
        code, length = ac_codes[0x00]  # EOB
        w.put(code, length)
    return dc


def _headers(h: int, w: int, ncomp: int) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt(0, QUANT_LUMA)
    if ncomp == 3:
        out += _dqt(1, QUANT_CHROMA)
    comps = b""
    for c in range(ncomp):
        comps += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    out += _dht(0, 0, _DC_SPEC) + _dht(1, 0, _AC_SPEC)
    if ncomp == 3:
        out += _dht(0, 1, _DC_SPEC) + _dht(1, 1, _AC_SPEC)
    scomp = b""
    for c in range(ncomp):
        t = 0 if c == 0 else 1
        scomp += bytes([c + 1, (t << 4) | t])
    out += _seg(0xFFDA, bytes([ncomp]) + scomp + b"\x00\x3f\x00")
    return bytes(out)


def _rgb_to_ycbcr(a: np.ndarray) -> np.ndarray:
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(a: np.ndarray) -> np.ndarray:
    y, cb, cr = a[..., 0], a[..., 1] - 128.0, a[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def encode_jpeg(arr: np.ndarray) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JPEG
    (4:4:4, our embedded tables). Lossy like any JPEG: quantization
    rounds DCT coefficients."""
    a = np.asarray(arr, np.float64)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    planes = [a] if gray else list(np.moveaxis(_rgb_to_ycbcr(a), -1, 0))
    quants = [QUANT_LUMA] if gray else [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    dc_codes = _canonical_codes(*_DC_SPEC)
    ac_codes = _canonical_codes(*_AC_SPEC)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bw * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]  # edge replication
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp - 128.0)
    bwri = _BitWriter()
    preds = [0] * len(planes)
    for by in range(bh):
        for bx in range(bw):
            for ci, p in enumerate(padded):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                q = quants[ci]
                qc = np.floor(dct2(blk) / q + 0.5).astype(np.int64)
                preds[ci] = _encode_block(
                    bwri, qc, preds[ci], dc_codes, ac_codes
                )
    return _headers(h, w, len(planes)) + bwri.flush() + b"\xff\xd9"


def encode_gray_from_coeffs(qcoefs: np.ndarray) -> bytes:
    """Build a real grayscale JPEG directly from QUANTIZED coefficient
    blocks (shape (bh, bw, 8, 8) ints). Decoding recovers exactly
    clip(round(IDCT(qcoef * QUANT_LUMA)) + 128) — the lossless path
    through a lossy format that arithmetic oracles need."""
    q = np.asarray(qcoefs, np.int64)
    if q.ndim != 4 or q.shape[2:] != (8, 8):
        raise ValueError("expected (bh, bw, 8, 8) quantized coefficients")
    bh, bw = q.shape[:2]
    dc_codes = _canonical_codes(*_DC_SPEC)
    ac_codes = _canonical_codes(*_AC_SPEC)
    wri = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            pred = _encode_block(wri, q[by, bx], pred, dc_codes, ac_codes)
    return _headers(bh * 8, bw * 8, 1) + wri.flush() + b"\xff\xd9"


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
def parse_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG -> uint8 (h, w) or (h, w, 3). Supports
    SOF0, 8-bit, 1 or 3 components at 1x1 sampling, tables from the
    file's own DQT/DHT segments (standard or custom). Progressive
    (SOF2), subsampling, and restart markers raise ValueError — as
    does EVERY malformed input (total over arbitrary bytes: short
    segment bodies surface as struct/index errors inside and are
    normalized here, never leaked)."""
    try:
        return _parse_jpeg_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed JPEG structure: {e}") from e


def _parse_jpeg_inner(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict] = {}
    sof = None
    scan_comps = None
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) < ln - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            b = body
            while b:
                tid = b[0] & 0x0F
                if b[0] >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros((8, 8), np.int32)
                for k, (i, j) in enumerate(ZIGZAG):
                    t[i, j] = b[1 + k]
                quants[tid] = t
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                tclass, tid = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17 : 17 + n])
                huffs[(tclass, tid)] = _canonical_codes(bits, vals)
                b = b[17 + n :]
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("chroma subsampling unsupported (1x1 only)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xDD:
            raise ValueError("restart markers unsupported")
        elif marker == 0xDA:  # SOS
            nc = body[0]
            scan_comps = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                for c in range(nc)
            ]
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if sof is None or scan_comps is None or data_start is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = sof
    if len(scan_comps) != len(comps):
        raise ValueError("scan/frame component mismatch")
    # entropy data runs until EOI
    end = payload.rfind(b"\xff\xd9")
    if end < data_start:
        raise ValueError("missing EOI")
    r = _BitReader(payload[data_start:end])
    # invert the canonical codes for decode: (length, code) -> symbol
    dec = {}
    for key, codes in huffs.items():
        dec[key] = {(ln_, c): s for s, (c, ln_) in codes.items()}

    def read_symbol(table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | r.bit()
            length += 1
            s = table.get((length, code))
            if s is not None:
                return s
        raise ValueError("invalid Huffman code in scan")

    bh, bw = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8)) for _ in comps]
    preds = [0] * len(comps)
    for by in range(bh):
        for bx in range(bw):
            for ci, ((cid, tq), (scid, tdc, tac)) in enumerate(
                zip(comps, scan_comps)
            ):
                if cid != scid:
                    raise ValueError("scan component order mismatch")
                if tq not in quants:
                    raise ValueError(f"missing quant table {tq}")
                if (0, tdc) not in dec or (1, tac) not in dec:
                    raise ValueError("missing Huffman table")
                zz = np.zeros(64, np.int64)
                cat = read_symbol(dec[(0, tdc)])
                preds[ci] += _receive_extend(r, cat)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = read_symbol(dec[(1, tac)])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k > 63 or size == 0:
                        raise ValueError("corrupt AC run")
                    zz[k] = _receive_extend(r, size)
                    k += 1
                coef = np.zeros((8, 8), np.int64)
                for kk, (i, j) in enumerate(ZIGZAG):
                    coef[i, j] = zz[kk]
                px = idct2(coef * quants[tq]) + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
    out = np.stack([p[:h, :w] for p in planes], axis=-1)
    if len(comps) == 3:
        out = _ycbcr_to_rgb(out)
    out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return out[..., 0] if len(comps) == 1 else out
