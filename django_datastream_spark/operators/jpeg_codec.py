"""REAL JPEG codec — pure Python/numpy, spec-compliant subset.

The container has no image libraries, but JPEG's Huffman modes
(ITU T.81 / JFIF) are implementable from first principles: Huffman
entropy coding, zigzag run-length, quantization, and the 8x8 DCT are
all just arithmetic. This module implements both directions for the
subset:

- baseline sequential (SOF0), 8-bit precision
- **progressive (SOF2)**, 8-bit — full spectral selection AND
  successive approximation: interleaved/non-interleaved DC first +
  refinement scans, per-component AC band scans with EOB-run coding,
  and the AC refinement correction-bit protocol (T.81 Annex G)
- 1 (grayscale) or 3 (YCbCr 4:4:4, i.e. no chroma subsampling)
  components
- **restart markers** (DRI/RSTn), both directions: the encoder can
  emit a restart interval (predictors reset, writer byte-aligned,
  RST(m mod 8) between MCU groups) and the decoder verifies marker
  order and resets DC predictors / EOB runs at every boundary — the
  camera-JPEG resilience feature
- no arithmetic coding, no hierarchical mode (raise ValueError with
  the reason)

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
   The AC table covers all 256 symbols, so the EOBn run-length codes
   progressive scans need (symbols r<<4, r=1..14) are present too.

2. **Exactly-representable coefficients for oracles.** Quantization
   is the only lossy step. ``encode_gray_from_coeffs`` builds a real
   JPEG directly from QUANTIZED coefficients, so decoding recovers
   coeff*Q exactly and the pixel output is the pure closed form
   ``clip(round(IDCT(K*Q)) + 128)`` — recomputable in SQL with cos()
   (q168's arithmetic oracle pins the whole Huffman->dequant->IDCT
   pipeline to the bit). Progressive transmission is coefficient-
   lossless by construction (successive approximation reassembles
   the exact integers), so the same closed form pins the SOF2 path
   (q183).

The 2-D DCT used is the orthonormal 8-point DCT-II matrix sandwich
``M @ B @ M.T``, which equals T.81's (1/4)c(u)c(v) double-cosine
definition exactly (the s_u*s_v scale factors multiply out to the
same 1/8, 1/(4*sqrt 2), 1/4 triangle).

Decode architecture (unified for both modes): every scan decodes
into per-component (bh, bw, 64) zigzag coefficient planes; a single
vectorized dequant + de-zigzag + einsum-IDCT reconstruction runs at
the end. Baseline is simply the one-scan special case, which is
exactly how T.81 frames it.
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

    def expect_rst(self, m: int) -> None:
        """Consume an RST(m) marker at a restart boundary: discard the
        partial byte (encoder pads with 1s), then require FFD0+m."""
        self.acc = 0
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated at restart boundary")
        if self.data[self.pos] != 0xFF or (
            self.data[self.pos + 1] != 0xD0 + (m & 7)
        ):
            raise ValueError(
                f"expected RST{m & 7} at restart boundary, got "
                f"0x{self.data[self.pos]:02X}{self.data[self.pos + 1]:02X}"
            )
        self.pos += 2


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = r.bits(size)
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _point_ac(v: int, al: int) -> int:
    """AC successive-approximation point transform: divide by 2^Al
    truncating toward ZERO (T.81 G.1.2.2 — unlike DC, which uses the
    arithmetic shift / floor)."""
    return -((-v) >> al) if v < 0 else v >> al


# ---------------------------------------------------------------------------
# segment builders
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


def _frame_headers(h: int, w: int, ncomp: int, sof_marker: int) -> bytes:
    """SOI..DHT common prefix; SOF0 (baseline) or SOF2 (progressive)."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt(0, QUANT_LUMA)
    if ncomp == 3:
        out += _dqt(1, QUANT_CHROMA)
    comps = b""
    for c in range(ncomp):
        comps += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += _seg(sof_marker, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    out += _dht(0, 0, _DC_SPEC) + _dht(1, 0, _AC_SPEC)
    if ncomp == 3:
        out += _dht(0, 1, _DC_SPEC) + _dht(1, 1, _AC_SPEC)
    return bytes(out)


def _sos_header(comp_specs, ss: int, se: int, ah: int, al: int) -> bytes:
    """comp_specs: [(component_id, dc_table, ac_table), ...]."""
    body = bytes([len(comp_specs)])
    for cid, td, ta in comp_specs:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xFFDA, body)


# ---------------------------------------------------------------------------
# encoder — shared coefficient stage
# ---------------------------------------------------------------------------
def _quantize_planes(a: np.ndarray, gray: bool):
    """(h, w[, 3]) float -> per-component (bh, bw, 64) int64 zigzag
    quantized coefficient planes + the quant table per component."""
    h, w = a.shape[:2]
    planes = [a] if gray else list(np.moveaxis(_rgb_to_ycbcr(a), -1, 0))
    quants = [QUANT_LUMA] if gray else [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    bh, bw = (h + 7) // 8, (w + 7) // 8
    out = []
    for p, q in zip(planes, quants):
        pp = np.empty((bh * 8, bw * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]  # edge replication
        pp[:, w:] = pp[:, w - 1 : w]
        pp -= 128.0
        blocks = pp.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,ijxy,vy->ijuv", _DCT_M, blocks, _DCT_M)
        qc = np.floor(coef / q + 0.5).astype(np.int64)
        zz = np.empty((bh, bw, 64), np.int64)
        for k, (i, j) in enumerate(ZIGZAG):
            zz[:, :, k] = qc[:, :, i, j]
        out.append(zz)
    return out


def _encode_block_zz(
    w: _BitWriter, zz, pred: int, dc_codes, ac_codes
) -> int:
    """Sequential entropy coding of one zigzag block; returns the new
    DC predictor."""
    dc, acs = int(zz[0]), [int(v) for v in zz[1:]]
    diff = dc - pred
    cat = _category(diff)
    if cat > 11:
        raise ValueError(
            f"DC difference {diff} exceeds baseline category 11"
        )
    if acs and _category(max(acs, key=abs)) > 10:
        # T.81 caps AC size at 10 in Huffman coding; a larger magnitude
        # would alias into the (run, size) symbol arithmetic and emit a
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


def _rst_boundary(out: bytearray, wri: _BitWriter, rst_idx: int) -> int:
    """Flush the writer, append its bytes + RST(idx%8); returns the
    next restart index. The caller continues with a FRESH writer."""
    out += wri.flush()
    out += bytes([0xFF, 0xD0 + (rst_idx & 7)])
    return rst_idx + 1


def _emit_sequential(coefs, restart_interval: int = 0) -> bytes:
    dc_codes = _canonical_codes(*_DC_SPEC)
    ac_codes = _canonical_codes(*_AC_SPEC)
    bh, bw = coefs[0].shape[:2]
    out = bytearray()
    wri = _BitWriter()
    preds = [0] * len(coefs)
    mcu = 0
    rst = 0
    total = bh * bw
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rst = _rst_boundary(out, wri, rst)
                wri = _BitWriter()
                preds = [0] * len(coefs)
            for ci, zz in enumerate(coefs):
                preds[ci] = _encode_block_zz(
                    wri, zz[by, bx], preds[ci], dc_codes, ac_codes
                )
            mcu += 1
    out += wri.flush()
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder — progressive scans (T.81 Annex G)
# ---------------------------------------------------------------------------
def _emit_dc_first(coefs, al: int, restart_interval: int = 0) -> bytes:
    """Interleaved DC scan, Ah=0: code DIFF of the point-transformed
    (arithmetic shift) DC across all components in MCU order."""
    dc_codes = _canonical_codes(*_DC_SPEC)
    out = bytearray()
    wri = _BitWriter()
    preds = [0] * len(coefs)
    bh, bw = coefs[0].shape[:2]
    mcu = rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rst = _rst_boundary(out, wri, rst)
                wri = _BitWriter()
                preds = [0] * len(coefs)
            mcu += 1
            for ci, zz in enumerate(coefs):
                v = int(zz[by, bx, 0]) >> al
                diff = v - preds[ci]
                preds[ci] = v
                cat = _category(diff)
                if cat > 11:
                    raise ValueError("DC difference exceeds category 11")
                code, length = dc_codes[cat]
                wri.put(code, length)
                if cat:
                    wri.put(
                        diff if diff >= 0 else diff + (1 << cat) - 1, cat
                    )
    out += wri.flush()
    return bytes(out)


def _emit_dc_refine(coefs, al: int, restart_interval: int = 0) -> bytes:
    """DC refinement scan (Ah=Al+1): one raw bit per block per
    component — bit Al of the DC coefficient, no Huffman coding."""
    out = bytearray()
    wri = _BitWriter()
    bh, bw = coefs[0].shape[:2]
    mcu = rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rst = _rst_boundary(out, wri, rst)
                wri = _BitWriter()
            mcu += 1
            for zz in coefs:
                wri.put((int(zz[by, bx, 0]) >> al) & 1, 1)
    out += wri.flush()
    return bytes(out)


def _emit_ac_first(coef, ss: int, se: int, al: int,
                   restart_interval: int = 0) -> bytes:
    """Single-component AC band scan, Ah=0: run-length + EOB-run
    coding of point-transformed coefficients. EOB runs accumulate
    across blocks (up to the 0x7FFF cap), exercising the decoder's
    multi-block skip."""
    ac_codes = _canonical_codes(*_AC_SPEC)
    out = bytearray()
    wri = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        code, length = ac_codes[r << 4]
        wri.put(code, length)
        if r:
            wri.put(eobrun - (1 << r), r)
        eobrun = 0

    bh, bw = coef.shape[:2]
    mcu = rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                flush_eob()  # EOB runs cannot cross restart boundaries
                rst = _rst_boundary(out, wri, rst)
                wri = _BitWriter()
            mcu += 1
            band = [
                _point_ac(int(v), al) for v in coef[by, bx, ss : se + 1]
            ]
            last = max((i for i, v in enumerate(band) if v), default=-1)
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for i in range(last + 1):
                v = band[i]
                if v == 0:
                    run += 1
                    if run == 16:
                        code, length = ac_codes[0xF0]  # ZRL
                        wri.put(code, length)
                        run = 0
                    continue
                size = _category(v)
                if size > 10:
                    raise ValueError("AC coefficient exceeds size 10")
                code, length = ac_codes[(run << 4) | size]
                wri.put(code, length)
                wri.put(v if v >= 0 else v + (1 << size) - 1, size)
                run = 0
            if last < len(band) - 1:
                eobrun += 1  # trailing zeros end in an EOB for this block
    flush_eob()
    out += wri.flush()
    return bytes(out)


def _emit_ac_refine(coef, ss: int, se: int, al: int,
                    restart_interval: int = 0) -> bytes:
    """Single-component AC refinement scan (Ah=Al+1): newly-nonzero
    coefficients code as (run, 1) + sign; history-nonzero positions
    contribute buffered correction bits that flush after the next
    emitted symbol (T.81 G.1.2.3 / the libjpeg buffering discipline,
    except EOB runs flush per block so correction bits never cross a
    block boundary)."""
    ac_codes = _canonical_codes(*_AC_SPEC)
    out = bytearray()
    wri = _BitWriter()
    bh, bw = coef.shape[:2]
    mcu = rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rst = _rst_boundary(out, wri, rst)
                wri = _BitWriter()
            mcu += 1
            band = [int(v) for v in coef[by, bx, ss : se + 1]]
            absv = [abs(v) >> al for v in band]
            # last newly-nonzero index; runs past it fold into the EOB
            eob_idx = max((i for i, t in enumerate(absv) if t == 1), default=-1)
            run = 0
            buf: list[int] = []  # pending correction bits
            for i, v in enumerate(band):
                t = absv[i]
                if t == 0:
                    run += 1
                    continue
                # ZRLs must be emitted as soon as ANY nonzero is reached
                # with >15 pending zeros (spec figure G.7): the decoder's
                # ZRL span reads the correction bits interleaved with the
                # 16 skipped zeros, so buffered bits flush per ZRL — not
                # deferred to the next newly-nonzero symbol
                while run > 15 and i <= eob_idx:
                    code, length = ac_codes[0xF0]  # ZRL
                    wri.put(code, length)
                    for b in buf:
                        wri.put(b, 1)
                    buf = []
                    run -= 16
                if t > 1:  # nonzero before this scan: correction bit
                    buf.append(t & 1)
                    continue
                # newly nonzero (|v| >> Al == 1)
                code, length = ac_codes[(run << 4) | 1]
                wri.put(code, length)
                wri.put(1 if v > 0 else 0, 1)
                for b in buf:
                    wri.put(b, 1)
                buf = []
                run = 0
            if run > 0 or buf:
                code, length = ac_codes[0x00]  # EOB (run of 1)
                wri.put(code, length)
                for b in buf:
                    wri.put(b, 1)
    out += wri.flush()
    return bytes(out)


#: the progressive scan script: DC first at Al=1, DC refine, then per
#: component an AC 1..63 first pass at Al=1 and its refinement — both
#: successive-approximation code paths (and EOB runs) get exercised.
_DC_AL = 1
_AC_AL = 1


def _emit_progressive(coefs, restart_interval: int = 0) -> bytes:
    ncomp = len(coefs)
    out = bytearray()
    ri = restart_interval
    all_specs = [(c + 1, 0 if c == 0 else 1, 0 if c == 0 else 1)
                 for c in range(ncomp)]
    out += _sos_header(all_specs, 0, 0, 0, _DC_AL)
    out += _emit_dc_first(coefs, _DC_AL, ri)
    out += _sos_header(all_specs, 0, 0, _DC_AL, 0)
    out += _emit_dc_refine(coefs, 0, ri)
    for c in range(ncomp):
        spec = [all_specs[c]]
        out += _sos_header(spec, 1, 63, 0, _AC_AL)
        out += _emit_ac_first(coefs[c], 1, 63, _AC_AL, ri)
    for c in range(ncomp):
        spec = [all_specs[c]]
        out += _sos_header(spec, 1, 63, _AC_AL, 0)
        out += _emit_ac_refine(coefs[c], 1, 63, 0, ri)
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


def encode_jpeg(arr: np.ndarray, progressive: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 -> JPEG
    (4:4:4, our embedded tables). ``progressive=True`` emits SOF2
    with a 2+2*ncomp scan script (DC first/refine, per-component AC
    first/refine). Both modes carry IDENTICAL quantized coefficients
    — progressive transmission is coefficient-lossless — so the two
    decodes agree bit for bit. Lossy like any JPEG: quantization
    rounds DCT coefficients."""
    a = np.asarray(arr, np.float64)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    coefs = _quantize_planes(a, gray)
    sof = 0xFFC2 if progressive else 0xFFC0
    head = _frame_headers(h, w, len(coefs), sof)
    if restart_interval:
        head += _seg(0xFFDD, struct.pack(">H", restart_interval))
    if progressive:
        body = _emit_progressive(coefs, restart_interval)
    else:
        ncomp = len(coefs)
        scomp = b""
        for c in range(ncomp):
            t = 0 if c == 0 else 1
            scomp += bytes([c + 1, (t << 4) | t])
        body = (
            _seg(0xFFDA, bytes([ncomp]) + scomp + b"\x00\x3f\x00")
            + _emit_sequential(coefs, restart_interval)
        )
    return head + body + b"\xff\xd9"


def encode_gray_from_coeffs(
    qcoefs: np.ndarray, progressive: bool = False
) -> bytes:
    """Build a real grayscale JPEG directly from QUANTIZED coefficient
    blocks (shape (bh, bw, 8, 8) ints). Decoding recovers exactly
    clip(round(IDCT(qcoef * QUANT_LUMA)) + 128) — the lossless path
    through a lossy format that arithmetic oracles need. With
    ``progressive=True`` the same coefficients ship as an SOF2 scan
    script; successive approximation reassembles the exact integers,
    so the law is unchanged (q183 pins this)."""
    q = np.asarray(qcoefs, np.int64)
    if q.ndim != 4 or q.shape[2:] != (8, 8):
        raise ValueError("expected (bh, bw, 8, 8) quantized coefficients")
    bh, bw = q.shape[:2]
    zz = np.empty((bh, bw, 64), np.int64)
    for k, (i, j) in enumerate(ZIGZAG):
        zz[:, :, k] = q[:, :, i, j]
    sof = 0xFFC2 if progressive else 0xFFC0
    head = _frame_headers(bh * 8, bw * 8, 1, sof)
    if progressive:
        body = _emit_progressive([zz])
    else:
        body = (
            _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
            + _emit_sequential([zz])
        )
    return head + body + b"\xff\xd9"


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
def parse_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG -> uint8
    (h, w) or (h, w, 3). Supports 8-bit, 1 or 3 components at 1x1
    sampling, tables from the file's own DQT/DHT segments (standard
    or custom), multi-scan progressive files with spectral selection,
    successive approximation, EOB runs, and restart markers
    (DRI/RSTn). Chroma subsampling, arithmetic coding, and the other
    SOF processes raise ValueError — as does EVERY malformed input
    (total over
    arbitrary bytes: short segment bodies surface as struct/index
    errors inside and are normalized here, never leaked)."""
    try:
        return _parse_jpeg_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed JPEG structure: {e}") from e


def _scan_end(payload: bytes, start: int) -> int:
    """Index of the marker terminating entropy-coded data that begins
    at ``start`` (skipping stuffed 0xFF00 and 0xFF fill bytes)."""
    i = start
    n = len(payload)
    while True:
        j = payload.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            raise ValueError("missing EOI")
        nxt = payload[j + 1]
        if nxt == 0x00:
            i = j + 2
            continue
        if nxt == 0xFF:  # fill byte
            i = j + 1
            continue
        if 0xD0 <= nxt <= 0xD7:
            i = j + 2  # restart marker: entropy data continues
            continue
        return j


def _invert_codes(codes: dict) -> dict:
    return {(length, c): s for s, (c, length) in codes.items()}


def _read_symbol(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        s = table.get((length, code))
        if s is not None:
            return s
    raise ValueError("invalid Huffman code in scan")


def _decode_seq_scan(r, scan, comps, coefs, dec,
                     restart_interval: int = 0):
    """Baseline single-scan: interleaved DC+AC per block."""
    bh, bw = coefs[0].shape[:2]
    preds = [0] * len(comps)
    mcu = rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.expect_rst(rst)
                rst += 1
                preds = [0] * len(comps)
            mcu += 1
            for ci, (cid, tdc, tac) in enumerate(scan):
                dc_tab = dec.get((0, tdc))
                ac_tab = dec.get((1, tac))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("missing Huffman table")
                zz = coefs[ci][by, bx]
                cat = _read_symbol(r, dc_tab)
                preds[ci] += _receive_extend(r, cat)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(r, ac_tab)
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


def _decode_dc_scan(r, scan, coefs, comp_idx, dec, ah, al,
                    restart_interval: int = 0):
    """Progressive DC scan (first or refinement), interleaved over the
    scan's components (MCU = one block each at 1x1 sampling)."""
    bh, bw = coefs[0].shape[:2]
    preds = [0] * len(scan)
    mcu = rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.expect_rst(rst)
                rst += 1
                preds = [0] * len(scan)
            mcu += 1
            for si, (cid, tdc, _tac) in enumerate(scan):
                zz = coefs[comp_idx[cid]][by, bx]
                if ah == 0:  # first
                    dc_tab = dec.get((0, tdc))
                    if dc_tab is None:
                        raise ValueError("missing Huffman table")
                    cat = _read_symbol(r, dc_tab)
                    preds[si] += _receive_extend(r, cat)
                    zz[0] = preds[si] << al
                else:  # refinement: one raw bit
                    if r.bit():
                        zz[0] |= 1 << al


def _decode_ac_first(r, coef, ac_tab, ss, se, al, state,
                     restart_interval: int = 0):
    """Progressive AC band, Ah=0: run-length + EOB-run (state carries
    the eobrun across blocks of this scan)."""
    bh, bw = coef.shape[:2]
    mcu = rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.expect_rst(rst)
                rst += 1
                state["eobrun"] = 0  # runs never cross a boundary
            mcu += 1
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                continue
            zz = coef[by, bx]
            k = ss
            while k <= se:
                sym = _read_symbol(r, ac_tab)
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    eob = 1 << run
                    if run:
                        eob += r.bits(run)
                    state["eobrun"] = eob - 1  # current block included
                    break
                k += run
                if k > se:
                    raise ValueError("corrupt AC run in progressive scan")
                zz[k] = _receive_extend(r, size) << al
                k += 1


def _decode_ac_refine(r, coef, ac_tab, ss, se, al, state,
                      restart_interval: int = 0):
    """Progressive AC refinement (T.81 G.2 / the libjpeg discipline):
    newly-nonzero values arrive as (run, 1) + sign; every nonzero-
    history coefficient passed on the way reads a correction bit."""
    p1, m1 = 1 << al, -1 << al
    bh, bw = coef.shape[:2]

    def correct(zz, k):
        c = int(zz[k])
        if c and r.bit() and not (c & p1):
            zz[k] = c + (p1 if c >= 0 else m1)

    mcu = rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.expect_rst(rst)
                rst += 1
                state["eobrun"] = 0
            mcu += 1
            zz = coef[by, bx]
            k = ss
            if state["eobrun"] == 0:
                while k <= se:
                    sym = _read_symbol(r, ac_tab)
                    run, size = sym >> 4, sym & 0x0F
                    newval = 0
                    if size == 0:
                        if run != 15:
                            eob = 1 << run
                            if run:
                                eob += r.bits(run)
                            state["eobrun"] = eob
                            break
                        # ZRL: pass 16 zero-history coefficients
                    else:
                        if size != 1:
                            raise ValueError(
                                "refinement scan size must be 1"
                            )
                        newval = p1 if r.bit() else m1
                    while k <= se:
                        if zz[k] != 0:
                            correct(zz, k)
                        else:
                            run -= 1
                            if run < 0:
                                break
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError("corrupt refinement run")
                        zz[k] = newval
                    k += 1
            if state["eobrun"] > 0:
                while k <= se:
                    if zz[k] != 0:
                        correct(zz, k)
                    k += 1
                state["eobrun"] -= 1


def _parse_jpeg_inner(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dec: dict[tuple[int, int], dict] = {}
    sof = None
    progressive = False
    coefs = None
    comp_idx: dict[int, int] = {}
    saw_scan = False
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI
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
                dec[(tclass, tid)] = _invert_codes(
                    _canonical_codes(bits, vals)
                )
                b = b[17 + n :]
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if sof is not None:
                raise ValueError("multiple SOF segments")
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (1x1 only)"
                    )
                comps.append((cid, tq))
                comp_idx[cid] = c
            if h == 0 or w == 0:
                raise ValueError("empty frame")
            sof = (h, w, comps)
            bh, bw = (h + 7) // 8, (w + 7) // 8
            coefs = [np.zeros((bh, bw, 64), np.int64) for _ in comps]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline SOF0 / progressive SOF2")
        elif marker == 0xDD:  # DRI
            if ln != 4:
                raise ValueError("malformed DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — decode the scan inline
            if sof is None:
                raise ValueError("SOS before SOF")
            nc_s = body[0]
            if len(body) < 4 + 2 * nc_s:
                raise ValueError("truncated SOS header")
            scan = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4,
                 body[2 + 2 * c] & 0x0F)
                for c in range(nc_s)
            ]
            for cid, _, _ in scan:
                if cid not in comp_idx:
                    raise ValueError("scan names unknown component")
            ss, se = body[1 + 2 * nc_s], body[2 + 2 * nc_s]
            ahal = body[3 + 2 * nc_s]
            ah, al = ahal >> 4, ahal & 0x0F
            data_start = pos + 2 + ln
            end = _scan_end(payload, data_start)
            r = _BitReader(payload[data_start:end])
            if not progressive:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("baseline scan must cover 0..63")
                if len(scan) != len(sof[2]):
                    raise ValueError("scan/frame component mismatch")
                _decode_seq_scan(r, scan, sof[2], coefs, dec,
                                 restart_interval)
            elif ss == 0:  # DC scan
                if se != 0:
                    raise ValueError(
                        "progressive scan with Ss=0 requires Se=0"
                    )
                _decode_dc_scan(r, scan, coefs, comp_idx, dec, ah, al,
                                 restart_interval)
            else:  # AC band scan
                if len(scan) != 1:
                    raise ValueError(
                        "progressive AC scans are single-component"
                    )
                if se > 63 or se < ss:
                    raise ValueError("bad spectral band")
                cid, _tdc, tac = scan[0]
                ac_tab = dec.get((1, tac))
                if ac_tab is None:
                    raise ValueError("missing Huffman table")
                state = {"eobrun": 0}
                fn = _decode_ac_first if ah == 0 else _decode_ac_refine
                fn(r, coefs[comp_idx[cid]], ac_tab, ss, se, al, state,
                   restart_interval)
            saw_scan = True
            pos = end
            continue
        pos += 2 + ln
    if sof is None or not saw_scan:
        raise ValueError("missing SOF/SOS")
    if payload.rfind(b"\xff\xd9") < 0:
        raise ValueError("missing EOI")
    h, w, comps = sof
    # reconstruct: de-zigzag, dequantize, vectorized IDCT
    planes = []
    for (cid, tq), zz in zip(comps, coefs):
        if tq not in quants:
            raise ValueError(f"missing quant table {tq}")
        bh, bw = zz.shape[:2]
        blocks = np.zeros((bh, bw, 8, 8), np.float64)
        for k, (i, j) in enumerate(ZIGZAG):
            blocks[:, :, i, j] = zz[:, :, k]
        blocks *= quants[tq]
        px = np.einsum("ux,ijuv,vy->ijxy", _DCT_M, blocks, _DCT_M) + 128.0
        planes.append(
            px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)[:h, :w]
        )
    out = np.stack(planes, axis=-1)
    if len(comps) == 3:
        out = _ycbcr_to_rgb(out)
    out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return out[..., 0] if len(comps) == 1 else out
