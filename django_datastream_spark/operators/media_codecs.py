"""REAL media codecs implemented from their specs — WAV (RIFF/PCM16),
PPM (P6), PNG (DEFLATE via stdlib zlib), GIF87a (variable-width LZW),
BMP (24-bit + paletted RLE8), and the PVM video container; JPEG
(baseline + progressive) lives in :mod:`jpeg_codec`, FLAC in
:mod:`flac_codec`, PDF in :mod:`pdf_codec`, EXIF in :mod:`exif`.

The container ships no media libraries, but none of these formats
need one: the chunk walks, LZW/DEFLATE entropy stages, filters, and
feature math are all implementable with ``struct`` + ``zlib`` + numpy,
and each decode path is pinned by tests that synthesize valid files
(stdlib ``wave`` writer, hand-built headers, our own spec encoders)
and assert signal-level ground truth (sine RMS = A/sqrt(2),
zero-crossing rate = 2f/sr, exact lossless roundtrips, closed-form
pixel statistics in the q116/q158/q168/q169 oracles). Only MP3/H.264
remain stubbed (MDCT/CABAC out of scope — operators/multimodal.py).

Everything is a pure function over ``bytes``; the mapInPandas
closures in :mod:`multimodal` import this module INSIDE the executor
task, so the package must be importable on executors
(``session.harden_session`` ships it via addPyFile for
externally-created sessions).
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# WAV (RIFF little-endian, PCM16)
# ---------------------------------------------------------------------------
def parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE PCM16 payload -> (sample_rate, n_channels,
    samples[int16, interleaved]). Walks the chunk list (chunks are
    word-aligned), so extra chunks (LIST/INFO, fact) are skipped the
    way a real reader must."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(
                f"truncated {cid!r} chunk ({len(body)} of {size} bytes)"
            )
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk too short ({len(fmt)} bytes)")
    audio_fmt, ch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    if ch <= 0 or sr <= 0:
        raise ValueError(f"invalid fmt (channels={ch}, sample_rate={sr})")
    samples = np.frombuffer(data[: (len(data) // (2 * ch)) * 2 * ch], "<i2")
    return sr, ch, samples


def wav_features(payload: bytes) -> dict:
    """Signal-level features of a PCM16 WAV: duration, per-payload RMS
    (full-scale normalized), peak, and zero-crossing rate — the audio
    quality/dedup signals a training pipeline filters on."""
    sr, ch, x = parse_wav(payload)
    n_frames = len(x) // ch if ch else 0
    xf = x.astype(np.float64) / 32768.0
    mono = xf.reshape(-1, ch).mean(axis=1) if n_frames else np.zeros(0)
    zc = (
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if len(mono) > 1
        else 0.0
    )
    return {
        "sample_rate": int(sr),
        "channels": int(ch),
        "duration_ms": int(round(n_frames * 1000.0 / sr)) if sr else 0,
        "rms": float(np.sqrt(np.mean(xf**2))) if len(xf) else 0.0,
        "peak": float(np.max(np.abs(xf))) if len(xf) else 0.0,
        "zcr": zc,
    }


# ---------------------------------------------------------------------------
# PPM (P6 binary, maxval 255)
# ---------------------------------------------------------------------------
def parse_ppm(payload: bytes) -> np.ndarray:
    """Parse binary P6 -> uint8 array (h, w, 3). Handles comment lines
    and arbitrary whitespace in the header, per the netpbm spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize header: magic, width, height, maxval, then ONE whitespace
    # byte before pixel data
    tokens, pos = [], 2
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end of line
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    pos += 1  # the single whitespace after maxval
    px = np.frombuffer(payload[pos : pos + w * h * 3], np.uint8)
    if len(px) < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return px.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def bt601_luma(a: np.ndarray) -> np.ndarray:
    """BT.601 luma of an (h, w, 3) float array — THE luma definition
    shared by ppm_features, ppm_dhash_chunks, and the video sampler
    (one place to change if the weights ever move to BT.709)."""
    return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]


def image_features_from_array(a: np.ndarray) -> dict:
    """THE feature contract, one place: dims, per-channel means, BT.601
    luma mean/std. Accepts (h, w), (h, w, 1..4); grayscale/gray+alpha
    replicate into the channel means, alpha is excluded (a quality
    filter scores pixels, not transparency). Every decoder's feature
    path — PPM, PNG, JPEG, GIF, pure or Spark-side — funnels through
    here so a weights change cannot desync the oracles."""
    a = np.asarray(a, np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    rgb = np.repeat(a[..., :1], 3, axis=2) if a.shape[2] in (1, 2) else a[..., :3]
    luma = bt601_luma(rgb)
    return {
        "width": int(rgb.shape[1]),
        "height": int(rgb.shape[0]),
        "mean_r": float(rgb[..., 0].mean()),
        "mean_g": float(rgb[..., 1].mean()),
        "mean_b": float(rgb[..., 2].mean()),
        "luma_mean": float(luma.mean()),
        "luma_std": float(luma.std()),
    }


def ppm_features(payload: bytes) -> dict:
    """Image-level features of a P6 payload (shared contract)."""
    return image_features_from_array(parse_ppm(payload))


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of a P6 payload — a REAL image resize
    (index-map sampling, the same kernel Pillow's NEAREST uses),
    re-encoded as P6."""
    a = parse_ppm(payload)
    h, w = a.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_ppm(a[rows][:, cols])


def ppm_dhash_chunks(payload: bytes) -> list[int]:
    """Perceptual dHash of a P6 payload as FOUR 16-bit chunks.

    Grayscale (BT.601 luma) is sampled on a 9x8 nearest-neighbor grid
    (x_j = floor(j*w/9), y_i = floor(i*h/8)); bit (i, j) is
    luma(i, j+1) > luma(i, j); bit position p = i*8 + j; chunk k
    holds bits [16k, 16k+16).  Chunked (rather than one 64-bit word)
    so the pigeonhole LSH join needs no 64-bit arithmetic anywhere:
    two hashes within Hamming distance 3 agree on at least one of the
    4 chunks exactly.
    """
    a = parse_ppm(payload).astype(np.float64)
    h, w = a.shape[:2]
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    luma = bt601_luma(a)[np.ix_(ys, xs)]
    bits = (luma[:, 1:] > luma[:, :-1]).astype(np.int64).ravel()  # 64
    chunks = []
    for k in range(4):
        seg = bits[16 * k : 16 * (k + 1)]
        chunks.append(int((seg << np.arange(16)).sum()))
    return chunks


# ---------------------------------------------------------------------------
# "PVM" — a minimal REAL video container: header + length-prefixed P6 frames.
# No external codecs needed, but the parsing, seeking, and per-frame decode
# are genuine computations (the same seek-then-decode shape an ffmpeg-backed
# sampler has), so the Spark plumbing around video can be oracle-verified.
# ---------------------------------------------------------------------------


def encode_pvm(frames: list[np.ndarray], fps: int) -> bytes:
    """Container layout: ``PVM1\\n<n_frames> <fps>\\n`` then each frame as
    an 8-byte big-endian length prefix + the P6 payload."""
    parts = [b"PVM1\n%d %d\n" % (len(frames), fps)]
    for f in frames:
        p = encode_ppm(f)
        parts.append(len(p).to_bytes(8, "big") + p)
    return b"".join(parts)


def parse_pvm_index(payload: bytes) -> tuple[int, int, list[tuple[int, int]]]:
    """Scan ONLY the header + length prefixes (never the pixel data):
    returns (n_frames, fps, [(offset, length), ...]).  This is the seek
    index — sampling frame k decodes frame k alone."""
    if not payload.startswith(b"PVM1\n"):
        raise ValueError("not a PVM payload")
    nl = payload.find(b"\n", 5)
    if nl < 0:
        raise ValueError("truncated PVM header")
    n_s, fps_s = payload[5:nl].split()
    n, fps = int(n_s), int(fps_s)
    if fps <= 0:
        raise ValueError("non-positive fps")
    if n < 0:
        raise ValueError("negative frame count")
    idx, pos = [], nl + 1
    for _ in range(n):
        if pos + 8 > len(payload):
            raise ValueError("truncated PVM frame table")
        ln = int.from_bytes(payload[pos : pos + 8], "big")
        idx.append((pos + 8, ln))
        pos += 8 + ln
    if pos > len(payload):
        raise ValueError("truncated PVM frame data")
    return n, fps, idx


def pvm_frame(payload: bytes, k: int, index=None) -> np.ndarray:
    """Decode frame k only (seek via the index, then the real PPM
    parse).  Pass ``index`` = a prior ``parse_pvm_index`` result to
    avoid re-walking the length prefixes once per sampled frame."""
    n, _fps, idx = index if index is not None else parse_pvm_index(payload)
    if not 0 <= k < n:
        raise IndexError(f"frame {k} of {n}")
    off, ln = idx[k]
    return parse_ppm(payload[off : off + ln])


# ---------------------------------------------------------------------------
# PNG — a REAL compressed-format codec, stdlib-only.
#
# PNG's compression is DEFLATE (RFC 1951), which the stdlib `zlib` module
# implements, so unlike JPEG/MP3/H.264 (entropy coders absent from this
# container, honestly stubbed in multimodal.py) PNG can be decoded FOR REAL:
# signature + chunk walk with CRC32 verification, IDAT inflate, and the five
# scanline filters (None/Sub/Up/Average/Paeth) reconstructed per the spec
# (RFC 2083 §6). Supported: bit depth 8, color types 0 (gray), 2 (RGB),
# 3 (palette), 4 (gray+alpha), 6 (RGBA), sequential AND Adam7 interlaced
# (each of the 7 passes is an independently filtered sub-image scattered
# back on the (x0,y0,dx,dy) grid — spec §8.2). The encoder applies the
# genuine forward filters (optionally per-pass, interlace=True) so
# round-trip tests exercise every unfilter branch, and arithmetic oracles
# (q158) verify the whole bytes->inflate->unfilter->feature path, not
# just the plumbing.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2).
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_chunks(payload: bytes):
    """Walk the chunk list, verifying each CRC32 (over type + data)."""
    import zlib

    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIG)
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        # the CRC must fit too — a payload cut anywhere inside
        # data OR the trailing 4 CRC bytes is the same clean error
        if len(data) < ln or pos + 12 + ln > len(payload):
            raise ValueError(f"truncated {ctype!r} chunk ({len(data)} of {ln})")
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, data
        pos += 12 + ln
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_scanlines(raw: np.ndarray, w: int, h: int, nch: int) -> np.ndarray:
    """Reconstruct ``h`` filtered scanlines of ``w`` pixels -> uint8
    (h, w, nch). ``raw`` is the (h, stride+1) filtered byte grid (filter
    byte first). Sub is reconstructed as a per-lane cumulative sum mod
    256 (addition commutes with cumsum under wraparound); Up is a vector
    add against the prior reconstructed row; Average/Paeth are
    sequential in x by definition, so they loop pixels but vectorize the
    byte lanes. Shared by the sequential path and each Adam7 pass (a
    pass is just a smaller image with its own filter context)."""
    stride = w * nch
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f, row = int(filters[y]), rows[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: cumsum per byte lane, mod 256
            rec = np.cumsum(row.reshape(w, nch), axis=0).reshape(stride)
        elif f == 2:  # Up
            rec = row + prev
        elif f == 3:  # Average
            rec = row.copy()
            for x in range(stride):
                left = rec[x - nch] & 0xFF if x >= nch else 0
                rec[x] = row[x] + ((left + (prev[x] & 0xFF)) >> 1)
        elif f == 4:  # Paeth
            rec = row.copy()
            for x in range(stride):
                a = rec[x - nch] & 0xFF if x >= nch else 0
                b = prev[x] & 0xFF
                c = prev[x - nch] & 0xFF if x >= nch else 0
                rec[x] = row[x] + _paeth(a, b, c)
        else:
            raise ValueError(f"unknown filter type {f} on row {y}")
        prev = rec & 0xFF
        out[y] = prev
    return out.astype(np.uint8).reshape(h, w, nch)


def parse_png(payload: bytes) -> np.ndarray:
    """Parse a PNG payload -> uint8 array (h, w, channels).

    Real decode: CRC-checked chunk walk, zlib inflate of the IDAT
    stream, scanline unfiltering (``_unfilter_scanlines``). Palette
    images are expanded through PLTE to RGB. Adam7-interlaced images
    decode each of the 7 passes as an independent sub-image (its own
    filter context, per spec §8.2) and scatter the pixels back onto
    the (x0, y0, dx, dy) grid."""
    import zlib

    ihdr = plte = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("missing/short IHDR")
    w, h, depth, ctype_i, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if depth != 8:
        raise ValueError(f"only bit depth 8 supported (got {depth})")
    if ctype_i not in _PNG_CHANNELS:
        raise ValueError(f"unsupported color type {ctype_i}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown interlace method {interlace}")
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid dimensions {w}x{h}")
    nch = _PNG_CHANNELS[ctype_i]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if interlace == 0:
        if len(raw) != h * (stride + 1):
            raise ValueError(
                f"IDAT size mismatch ({len(raw)} != {h * (stride + 1)})"
            )
        px = _unfilter_scanlines(
            np.frombuffer(raw, np.uint8).reshape(h, stride + 1), w, h, nch
        )
    else:  # Adam7
        px = np.zeros((h, w, nch), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes zero bytes
            pstride = pw * nch
            nbytes = ph * (pstride + 1)
            if len(raw) - pos < nbytes:
                raise ValueError("truncated Adam7 pass data")
            sub = np.frombuffer(raw[pos : pos + nbytes], np.uint8)
            pos += nbytes
            px[y0::dy, x0::dx] = _unfilter_scanlines(
                sub.reshape(ph, pstride + 1), pw, ph, nch
            )
        if pos != len(raw):
            raise ValueError(
                f"IDAT size mismatch ({len(raw)} != {pos} across 7 passes)"
            )
    if ctype_i == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette image without a valid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    return px


def _filter_scanlines(a: np.ndarray, filter_type: int) -> bytes:
    """Forward-filter an (h, w, nch) uint8 image's scanlines with the
    given filter -> the raw pre-DEFLATE byte stream (filter byte +
    filtered bytes per row). Shared by the sequential encoder and each
    Adam7 pass (whose filter context starts fresh, per spec)."""
    h, w, nch = a.shape
    flat = a.reshape(h, w * nch).astype(np.int64)
    stride = w * nch
    lines = []
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(nch, np.int64), cur[:-nch]])
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(nch, np.int64), cur[:-nch]])
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth
            filt = cur.copy()
            for x in range(stride):
                pa = cur[x - nch] if x >= nch else 0
                pb = prev[x]
                pc = prev[x - nch] if x >= nch else 0
                filt[x] = cur[x] - _paeth(int(pa), int(pb), int(pc))
        lines.append(bytes([filter_type]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return b"".join(lines)


def encode_png(
    arr: np.ndarray, filter_type: int = 4, interlace: bool = False
) -> bytes:
    """Encode (h, w) or (h, w, {1,2,3,4}) uint8 -> PNG, applying the
    REAL forward filter ``filter_type`` (0..4) to every scanline so the
    decoder's corresponding unfilter branch is genuinely exercised.
    ``interlace=True`` writes Adam7: the 7 passes extracted on the spec
    grid, each filtered independently, concatenated into one IDAT."""
    import zlib

    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4 (got {filter_type})")
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(nch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {nch}")
    if interlace:
        raw = b"".join(
            _filter_scanlines(np.ascontiguousarray(a[y0::dy, x0::dx]), filter_type)
            for x0, y0, dx, dy in _ADAM7
            if a[y0::dy, x0::dx].size
        )
    else:
        raw = _filter_scanlines(a, filter_type)

    def chunk(ctype_b: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype_b
            + data
            + struct.pack(">I", zlib.crc32(ctype_b + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, int(interlace))
    idat = zlib.compress(raw, 6)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def png_features(payload: bytes) -> dict:
    """Feature contract over the real PNG decode (shared helper)."""
    return image_features_from_array(parse_png(payload))


def png_to_ppm(payload: bytes) -> bytes:
    """Transcode PNG -> P6 (real decode, real re-encode); alpha dropped,
    gray replicated — the normalization step a multimodal pipeline runs
    before format-agnostic perceptual hashing."""
    a = parse_png(payload)
    if a.shape[2] in (1, 2):
        a = np.repeat(a[..., :1], 3, axis=2)
    return encode_ppm(a[..., :3])


# ---------------------------------------------------------------------------
# GIF87a — a second REAL compressed-format codec, LZW from the spec.
#
# GIF's compression is variable-width LZW (GIF89a spec appendix), a pure
# dictionary coder — no external libs needed. Implemented: GIF87a
# single-frame, global color table, 8-bit color depth, sequential and
# 4-pass interlaced row order, no extensions (GIF89a graphic-control
# blocks are SKIPPED on read). Encode is palette-based and LOSSLESS for images
# with <= 256 distinct colors, so the roundtrip law is exact equality —
# the strongest oracle a codec can have (q169).
# ---------------------------------------------------------------------------

GIF_SIGS = (b"GIF87a", b"GIF89a")


def _gif_interlace_order(h: int) -> list[int]:
    """Row storage order for an interlaced GIF (spec appendix E):
    pass 1 = rows 0,8,16…, pass 2 = 4,12…, pass 3 = 2,6…, pass 4 = odd."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB (<= 256 distinct colors) -> GIF87a
    with a REAL variable-width LZW compressor (clear/EOI codes, width
    growth at table fill, 12-bit cap with table reset).
    ``interlace=True`` stores rows in 4-pass order with the image
    descriptor's interlace flag set."""
    a = np.asarray(arr, np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w = a.shape[:2]
    if interlace:
        a = a[np.asarray(_gif_interlace_order(h), np.int64)]
    flat = a.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors (max 256)")
    # palette size must be a power of two >= 2
    depth = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << depth, 3), np.uint8)
    pal[: len(colors)] = colors
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])
    out += pal.tobytes()
    out += (
        b"\x2c"
        + struct.pack("<HHHH", 0, 0, w, h)
        + bytes([0x40 if interlace else 0x00])
    )
    min_code = max(2, depth)
    out.append(min_code)
    # --- LZW ---
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table: dict[tuple, int] = {}

    def reset():
        table.clear()
        for c in range(1 << min_code):
            table[(c,)] = c
        return eoi + 1, min_code + 1

    next_code, width = reset()
    bits = bytearray()
    acc = [0, 0]  # bit accumulator: value, count (LSB-first packing)

    def put(code, width):
        acc[0] |= code << acc[1]
        acc[1] += width
        while acc[1] >= 8:
            bits.append(acc[0] & 0xFF)
            acc[0] >>= 8
            acc[1] -= 8

    put(clear, width)
    seq: tuple = ()
    for px in idx.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        put(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:
                put(clear, width)
                next_code, width = reset()
        seq = (px,)
    if seq:
        put(table[seq], width)
    put(eoi, width)
    if acc[1]:
        bits.append(acc[0] & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def parse_gif(payload: bytes) -> np.ndarray:
    """Decode a GIF -> uint8 (h, w, 3): real variable-width LZW with
    clear-code resets and deferred-code handling (the KwKwK case).
    Single-frame; 89a extension blocks are skipped; interlaced row
    order is restored; local color tables raise ValueError."""
    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    if not flags & 0x80:
        raise ValueError("missing global color table")
    gct_size = 2 << (flags & 0x07)
    pos = 13
    pal = np.frombuffer(payload[pos : pos + gct_size * 3], np.uint8)
    if len(pal) < gct_size * 3:
        raise ValueError("truncated color table")
    pal = pal.reshape(-1, 3)
    pos += gct_size * 3
    while pos < len(payload) and payload[pos] == 0x21:  # extensions: skip
        pos += 2
        while pos < len(payload) and payload[pos]:
            pos += payload[pos] + 1
        pos += 1
    if pos >= len(payload) or payload[pos] != 0x2C:
        raise ValueError("missing image descriptor")
    if len(payload) < pos + 11:
        raise ValueError("truncated image descriptor")
    ix, iy, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
    iflags = payload[pos + 9]
    interlaced = bool(iflags & 0x40)
    if iflags & 0x80:
        raise ValueError("local color tables not supported")
    if (ix, iy, iw, ih) != (0, 0, w, h):
        raise ValueError("partial-frame GIF not supported")
    pos += 10
    min_code = payload[pos]
    pos += 1
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code}")
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        data += payload[pos : pos + n]
        if len(payload) - pos < n:
            raise ValueError("truncated sub-block")
        pos += n
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    # LSB-first bit reader over the concatenated sub-blocks
    acc = n_bits = 0
    di = 0

    def read(width):
        nonlocal acc, n_bits, di
        while n_bits < width:
            if di >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[di] << n_bits
            di += 1
            n_bits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        return v

    table: list[list[int]] = []

    def reset_table():
        table.clear()
        table.extend([c] for c in range(1 << min_code))
        table.append([])  # clear
        table.append([])  # eoi
        return min_code + 1

    width = reset_table()
    out: list[int] = []
    prev: list[int] | None = None
    while True:
        code = read(width)
        if code == clear:
            width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or len(table[code])):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > w * h:
            raise ValueError("LZW output exceeds image size")
    if len(out) != w * h:
        raise ValueError(f"LZW output {len(out)} != {w * h} pixels")
    idx = np.asarray(out, np.int64).reshape(h, w)
    if interlaced:
        # stored rows are in 4-pass order; scatter back to display order
        disp = np.empty_like(idx)
        disp[np.asarray(_gif_interlace_order(h), np.int64)] = idx
        idx = disp
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("palette index out of range")
    return pal[idx]


# ---------------------------------------------------------------------------
# BMP (Windows DIB) — 24-bit BI_RGB + 8-bit paletted, incl. REAL RLE8
# ---------------------------------------------------------------------------
def _bmp_headers(w: int, h: int, bpp: int, compression: int,
                 img_size: int, palette: bytes) -> bytes:
    off = 14 + 40 + len(palette)
    file_hdr = b"BM" + struct.pack("<IHHI", off + img_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, img_size,
        2835, 2835, len(palette) // 4, 0,
    )
    return file_hdr + info + palette


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> 24-bit BI_RGB BMP (bottom-up rows, BGR
    byte order, 4-byte row padding — the classic layout)."""
    a = np.asarray(arr, np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for r in range(h - 1, -1, -1):  # bottom-up
        rows += a[r, :, ::-1].tobytes() + pad  # BGR
    return _bmp_headers(w, h, 24, 0, len(rows), b"") + bytes(rows)


def encode_bmp_rle8(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) palette indices + (n, 3) RGB palette -> BI_RLE8 BMP.
    Emits runs (count, index), ABSOLUTE mode for non-repeating
    stretches of >= 3 (word-aligned per spec), end-of-line and
    end-of-bitmap escapes — every decoder branch except delta, which
    real encoders reserve for sparse icons."""
    ix = np.asarray(indices, np.uint8)
    if ix.ndim != 2:
        raise ValueError("expected (h, w) indices")
    pal = np.asarray(palette, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("palette must be (n<=256, 3)")
    h, w = ix.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    pal_bytes = b"".join(
        bytes([b, g, r, 0]) for r, g, b in pal.tolist()
    ) + b"\x00" * 4 * (256 - len(pal))
    out = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = ix[r].tolist()
        # split into maximal runs
        runs = []
        i = 0
        while i < w:
            j = i + 1
            while j < w and row[j] == row[i]:
                j += 1
            runs.append((j - i, row[i]))
            i = j
        # merge stretches of short runs into absolute chunks
        i = 0
        while i < len(runs):
            if runs[i][0] >= 3 or (
                i + 1 >= len(runs) and runs[i][0] >= 1
            ):
                n, v = runs[i]
                while n > 255:
                    out += bytes([255, v])
                    n -= 255
                if n:
                    out += bytes([n, v])
                i += 1
                continue
            # collect literal pixels across consecutive short runs
            lit = []
            while i < len(runs) and runs[i][0] < 3:
                lit.extend([runs[i][1]] * runs[i][0])
                i += 1
            while len(lit) >= 3:
                chunk = lit[: min(len(lit), 255)]
                lit = lit[len(chunk) :]
                out += bytes([0, len(chunk)]) + bytes(chunk)
                if len(chunk) & 1:
                    out += b"\x00"  # word alignment
            for v in lit:  # <3 leftovers: absolute is illegal, use runs
                out += bytes([1, v])
        out += b"\x00\x00"  # end of line
    out[-2:] = b"\x00\x01"  # last EOL becomes end of bitmap
    return _bmp_headers(w, h, 8, 1, len(out), pal_bytes) + bytes(out)


def parse_bmp(payload: bytes) -> np.ndarray:
    """Decode BMP -> uint8 (h, w, 3). Supports 24-bit BI_RGB and
    8-bit paletted BI_RGB / BI_RLE8 (runs, absolute mode with word
    alignment, EOL/EOB/delta escapes), bottom-up and top-down rows.
    Total: malformed inputs raise ValueError."""
    try:
        return _parse_bmp_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed BMP structure: {e}") from e


def _parse_bmp_inner(payload: bytes) -> np.ndarray:
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMPs unsupported")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (comp,) = struct.unpack("<I", payload[30:34])
    (ncolors,) = struct.unpack("<I", payload[46:50])
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or planes != 1:
        raise ValueError("invalid BMP dimensions")
    if bpp == 24 and comp == 0:
        stride = (w * 3 + 3) & ~3
        need = data_off + stride * h
        if len(payload) < need:
            raise ValueError("truncated 24-bit pixel data")
        img = np.frombuffer(
            payload[data_off : data_off + stride * h], np.uint8
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        return img if top_down else img[::-1]
    if bpp == 8 and comp in (0, 1):
        n = ncolors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload[pal_off : pal_off + 4 * n], np.uint8
        )
        if len(pal) < 4 * n:
            raise ValueError("truncated palette")
        pal = pal.reshape(n, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        if comp == 0:
            stride = (w + 3) & ~3
            if len(payload) < data_off + stride * h:
                raise ValueError("truncated 8-bit pixel data")
            ix = np.frombuffer(
                payload[data_off : data_off + stride * h], np.uint8
            ).reshape(h, stride)[:, :w]
        else:  # BI_RLE8 (always bottom-up per spec)
            if top_down:
                raise ValueError("top-down RLE8 is illegal")
            ix = np.zeros((h, w), np.uint8)
            pos, x, y = data_off, 0, 0
            while True:
                if pos + 2 > len(payload):
                    raise ValueError("truncated RLE8 stream")
                cnt, val = payload[pos], payload[pos + 1]
                pos += 2
                if cnt > 0:  # run
                    if y >= h or x + cnt > w:
                        raise ValueError("RLE8 run overflows row")
                    ix[y, x : x + cnt] = val
                    x += cnt
                elif val == 0:  # end of line
                    x, y = 0, y + 1
                elif val == 1:  # end of bitmap
                    break
                elif val == 2:  # delta
                    if pos + 2 > len(payload):
                        raise ValueError("truncated RLE8 delta")
                    x += payload[pos]
                    y += payload[pos + 1]
                    pos += 2
                    if x > w or y > h:
                        raise ValueError("RLE8 delta out of bounds")
                else:  # absolute mode: val literal indices
                    if pos + val > len(payload):
                        raise ValueError("truncated RLE8 absolute run")
                    if y >= h or x + val > w:
                        raise ValueError("RLE8 absolute overflows row")
                    ix[y, x : x + val] = np.frombuffer(
                        payload[pos : pos + val], np.uint8
                    )
                    x += val
                    pos += val + (val & 1)  # word alignment
            ix = ix[::-1]  # stored bottom-up
            if int(ix.max(initial=0)) >= n:
                raise ValueError("palette index out of range")
            return pal[ix]
        if int(ix.max(initial=0)) >= n:
            raise ValueError("palette index out of range")
        img = pal[ix]
        return img if top_down else img[::-1]
    raise ValueError(
        f"unsupported BMP variant (bpp={bpp}, compression={comp})"
    )


# ---------------------------------------------------------------------------
# TIFF (baseline 6.0) — uncompressed / PackBits / LZW strips
# ---------------------------------------------------------------------------
#: tag ids (TIFF 6.0 baseline)
_T_WIDTH, _T_HEIGHT, _T_BPS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_STRIP_OFF, _T_SPP, _T_RPS, _T_STRIP_CNT = (
    262, 273, 277, 278, 279,
)
_T_PLANAR = 284


def _packbits_encode(row: bytes) -> bytes:
    """Apple PackBits: literal runs (n>=0: n+1 bytes) and repeats
    (n in -1..-127: next byte 1-n times)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i + 1
        while j < n and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            while run > 0:
                take = min(run, 128)
                out += bytes([(257 - take) & 0xFF, row[i]])
                run -= take
            i = j
            continue
        # literal stretch: until the next >=3 repeat (2-repeats inside a
        # literal cost the same either way; 3 breaks even at run coding)
        k = i + 1
        while k < n:
            if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                break
            k += 1
        lit = row[i:k]
        while lit:
            take = lit[:128]
            out += bytes([len(take) - 1]) + take
            lit = lit[len(take):]
        i = k
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expect:
        if i >= len(data):
            raise ValueError("truncated PackBits stream")
        n = data[i]
        i += 1
        if n < 128:  # literal n+1
            if i + n + 1 > len(data):
                raise ValueError("truncated PackBits literal")
            out += data[i : i + n + 1]
            i += n + 1
        elif n == 128:  # noop
            continue
        else:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) != expect:
        raise ValueError("PackBits output overruns strip size")
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9-bit start, Clear=256,
    EOI=257, and the EARLY-CHANGE rule (width bumps one code sooner
    than GIF because the encoder reserves headroom for the next
    emit)."""
    out = _BitWriterMSB()
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out.put(CLEAR, width)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        out.put(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # early change: bump width when next_code+1 would overflow
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: reset
            out.put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        out.put(table[w], width)
    out.put(EOI, width)
    return out.flush()


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    r = _BitReaderMSB(data)
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expect:
        code = r.read(width)
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            continue
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError("bad initial LZW code")
            entry = table[code]
        elif code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # early change, decoder side: the decoder's table LAGS the
        # encoder by one add (an entry completes only when the next
        # code reveals its first byte), so the width bump fires at
        # 2^w - 2 where the encoder fired at next_code == 2^w - 1
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expect:
        raise ValueError(
            f"LZW strip decoded {len(out)} bytes, expected {expect}"
        )
    return bytes(out)


class _BitWriterMSB:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, width: int) -> None:
        self.acc = (self.acc << width) | (v & ((1 << width) - 1))
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = self.n = 0
        return bytes(self.out)


class _BitReaderMSB:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        end = self.pos + width
        if end > len(self.data) * 8:
            raise ValueError("truncated LZW stream")
        v = 0
        p = self.pos
        while width > 0:
            b = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, width)
            v = (v << take) | ((b >> (avail - take)) & ((1 << take) - 1))
            p += take
            width -= take
        self.pos = p
        return v


def encode_tiff(
    arr: np.ndarray, compression: str = "packbits",
    rows_per_strip: int = 8,
) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 -> baseline TIFF 6.0
    (little-endian, chunky, strips). compression: 'none' | 'packbits'
    | 'lzw'."""
    a = np.asarray(arr, np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    spp = 1 if gray else 3
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = a[y0 : y0 + rows_per_strip].tobytes()
        if compression == "packbits":
            strips.append(_packbits_encode(raw))
        elif compression == "lzw":
            strips.append(_tiff_lzw_encode(raw))
        else:
            strips.append(raw)
    nstrips = len(strips)

    # layout: header(8) + IFD + tag arrays + strip data
    tags = []  # (tag, type, count, value_or_offset_fixup)
    def short(v): return (3, 1, v)
    def long_(v): return (4, 1, v)

    entries = [
        (_T_WIDTH, *short(w)),
        (_T_HEIGHT, *short(h)),
        (_T_BPS, 3, spp, "BPS"),
        (_T_COMP, *short(comp_id)),
        (_T_PHOTO, *short(1 if gray else 2)),
        (_T_STRIP_OFF, 4, nstrips, "OFF"),
        (_T_SPP, *short(spp)),
        (_T_RPS, *short(rows_per_strip)),
        (_T_STRIP_CNT, 4, nstrips, "CNT"),
        (_T_PLANAR, *short(1)),
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    tail = bytearray()
    tail_base = ifd_off + ifd_size

    def alloc(raw: bytes) -> int:
        off = tail_base + len(tail)
        tail.extend(raw)
        return off

    bps_off = None
    if spp == 3:
        bps_off = alloc(struct.pack("<HHH", 8, 8, 8))
    # strip tables (patched after data placement)
    cnt_off = alloc(struct.pack("<" + "I" * nstrips,
                                *[len(s) for s in strips]))
    off_off = alloc(struct.pack("<" + "I" * nstrips, *([0] * nstrips)))
    strip_offsets = []
    for s in strips:
        strip_offsets.append(alloc(s))
    tail[off_off - tail_base : off_off - tail_base + 4 * nstrips] = (
        struct.pack("<" + "I" * nstrips, *strip_offsets)
    )

    ifd = struct.pack("<H", len(entries))
    for (tag, typ, cnt, val) in entries:
        if val == "BPS":
            v = 8 if spp == 1 else bps_off
        elif val == "OFF":
            v = strip_offsets[0] if nstrips == 1 else off_off
        elif val == "CNT":
            v = len(strips[0]) if nstrips == 1 else cnt_off
        else:
            v = val
        if typ == 3 and not isinstance(val, str):
            ifd += struct.pack("<HHIHH", tag, typ, cnt, v, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, v)
    ifd += struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", ifd_off) + ifd + bytes(tail)


def parse_tiff(payload: bytes) -> np.ndarray:
    """Decode baseline TIFF -> uint8 (h, w) or (h, w, 3). Supports
    both byte orders, chunky planar, 8-bit gray/RGB, strips with
    compression none/PackBits/LZW (TIFF-variant with early change).
    Total: malformed inputs raise ValueError."""
    try:
        return _parse_tiff_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed TIFF structure: {e}") from e


def _parse_tiff_inner(payload: bytes) -> np.ndarray:
    from django_datastream_spark.operators.exif import _parse_ifd

    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    tags = _parse_ifd(payload, e, ifd_off)

    def one(tag, default=None):
        v = tags.get(tag, default)
        if isinstance(v, list):
            return v[0] if v else default
        return v

    w = int(one(_T_WIDTH) or 0)
    h = int(one(_T_HEIGHT) or 0)
    if w <= 0 or h <= 0:
        raise ValueError("missing/invalid dimensions")
    spp = int(one(_T_SPP, 1))
    bps = tags.get(_T_BPS, [8])
    bps = bps if isinstance(bps, list) else [bps]
    if any(int(b) != 8 for b in bps):
        raise ValueError("only 8 bits per sample supported")
    if spp not in (1, 3):
        raise ValueError("only 1 or 3 samples per pixel")
    if int(one(_T_PLANAR, 1)) != 1:
        raise ValueError("planar configuration 2 unsupported")
    comp = int(one(_T_COMP, 1))
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    rps = int(one(_T_RPS, h))
    offs = tags.get(_T_STRIP_OFF)
    cnts = tags.get(_T_STRIP_CNT)
    if offs is None or cnts is None:
        raise ValueError("missing strip tables")
    offs = offs if isinstance(offs, list) else [offs]
    cnts = cnts if isinstance(cnts, list) else [cnts]
    if len(offs) != len(cnts):
        raise ValueError("strip table length mismatch")
    out = bytearray()
    for i, (o, c) in enumerate(zip(offs, cnts)):
        raw = payload[int(o) : int(o) + int(c)]
        if len(raw) < int(c):
            raise ValueError("truncated strip data")
        rows = min(rps, h - i * rps)
        expect = rows * w * spp
        if comp == 1:
            if len(raw) < expect:
                raise ValueError("short uncompressed strip")
            out += raw[:expect]
        elif comp == 32773:
            out += _packbits_decode(raw, expect)
        else:
            out += _tiff_lzw_decode(raw, expect)
    px = np.frombuffer(bytes(out), np.uint8)
    if len(px) != h * w * spp:
        raise ValueError("strip data does not cover the image")
    return px.reshape(h, w) if spp == 1 else px.reshape(h, w, 3)
