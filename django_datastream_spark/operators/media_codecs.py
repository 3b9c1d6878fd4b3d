"""REAL codec-free media decoders — WAV (RIFF/PCM16) and PPM (P6).

The container has no compressed-format codecs (JPEG/MP3/H.264 stay
honestly stubbed in operators/multimodal.py), but uncompressed
self-describing formats need only ``struct`` + numpy, so their decode /
feature-extract / resize paths are implemented for real here and
exercised by tests that synthesize valid files with the stdlib
(``wave`` writer, hand-built P6 headers) and assert signal-level
ground truth (sine RMS = A/sqrt(2), zero-crossing rate = 2f/sr,
nearest-neighbor pixel identities).

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


def ppm_features(payload: bytes) -> dict:
    """Image-level features: dimensions, per-channel means, luma
    mean/std (BT.601 weights) — the brightness/contrast signals an
    image-quality filter thresholds on."""
    a = parse_ppm(payload).astype(np.float64)
    luma = bt601_luma(a)
    return {
        "width": int(a.shape[1]),
        "height": int(a.shape[0]),
        "mean_r": float(a[..., 0].mean()),
        "mean_g": float(a[..., 1].mean()),
        "mean_b": float(a[..., 2].mean()),
        "luma_mean": float(luma.mean()),
        "luma_std": float(luma.std()),
    }


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
