"""Ground-truth tests for the REAL codec-free media decoders: WAV files
synthesized with the stdlib ``wave`` writer (so the RIFF layout is
authoritative, not our own encoder), PPM built per the netpbm spec.
Signal-level assertions: sine RMS = A/sqrt(2), ZCR = 2f/sr, exact
nearest-neighbor pixel identities."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest

from django_datastream_spark.operators import media_codecs as mc
from django_datastream_spark.operators import multimodal as mm


def make_wav(freq=440.0, sr=8000, seconds=1.0, amp=0.5, channels=1) -> bytes:
    n = int(sr * seconds)
    t = np.arange(n) / sr
    x = (amp * np.sin(2 * math.pi * freq * t) * 32767).astype("<i2")
    if channels == 2:
        x = np.repeat(x, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def make_ppm(w=4, h=2, comment=False) -> bytes:
    hdr = b"P6\n" + (b"# a comment\n" if comment else b"") + b"%d %d\n255\n" % (w, h)
    px = bytes((r * w + c) % 256 for r in range(h) for c in range(w) for _ in range(3))
    return hdr + px


def test_wav_sine_ground_truth():
    f = mc.wav_features(make_wav(freq=440.0, sr=8000, seconds=1.0, amp=0.5))
    assert f["sample_rate"] == 8000 and f["channels"] == 1
    assert f["duration_ms"] == 1000
    assert abs(f["rms"] - 0.5 / math.sqrt(2)) < 1e-3
    assert abs(f["peak"] - 0.5) < 1e-3
    # a 440 Hz sine crosses zero 2*440 times/sec -> zcr = 880/8000
    assert abs(f["zcr"] - 880 / 8000) < 0.005


def test_wav_stereo_and_extra_chunk():
    payload = make_wav(channels=2, seconds=0.5)
    # inject an extra odd-sized chunk between fmt and data: readers must
    # skip unknown chunks with word alignment
    pos = payload.find(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    hacked = payload[:pos] + extra + payload[pos:]
    hacked = hacked[:4] + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    f = mc.wav_features(hacked)
    assert f["channels"] == 2 and f["duration_ms"] == 500


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError):
        mc.parse_wav(b"not audio at all")


def test_ppm_parse_features_and_comment():
    f = mc.ppm_features(make_ppm(4, 2, comment=True))
    assert (f["width"], f["height"]) == (4, 2)
    # gray pixels (r=g=b) -> luma == channel mean == mean of 0..7
    assert abs(f["mean_r"] - 3.5) < 1e-9
    assert abs(f["luma_mean"] - 3.5) < 1e-6


def test_ppm_nearest_resize_exact():
    a = mc.parse_ppm(make_ppm(4, 2))
    up = mc.parse_ppm(mc.resize_ppm(make_ppm(4, 2), 8, 4))
    # 2x upscale: each source pixel becomes a 2x2 block
    for r in range(4):
        for c in range(8):
            assert (up[r, c] == a[r // 2, c // 2]).all()
    # identity resize round-trips exactly
    same = mc.parse_ppm(mc.resize_ppm(make_ppm(4, 2), 4, 2))
    assert (same == a).all()


def test_spark_wav_and_ppm_stages_match_pure_functions(spark):
    wavs = [make_wav(freq=200.0 + 100 * i, seconds=0.25) for i in range(4)]
    ppms = [make_ppm(4 + i, 2 + i) for i in range(4)]
    media_w = spark.createDataFrame(
        [(i, "audio", w) for i, w in enumerate(wavs)],
        "media_id long, kind string, content binary",
    )
    media_p = spark.createDataFrame(
        [(i, "image", p) for i, p in enumerate(ppms)],
        "media_id long, kind string, content binary",
    )
    got_w = {r["media_id"]: r for r in mm.extract_wav_features(media_w).collect()}
    for i, w in enumerate(wavs):
        ref = mc.wav_features(w)
        assert got_w[i]["duration_ms"] == ref["duration_ms"]
        assert abs(got_w[i]["rms"] - ref["rms"]) < 1e-12
        assert abs(got_w[i]["zcr"] - ref["zcr"]) < 1e-12
    got_p = {r["media_id"]: r for r in mm.extract_ppm_features(media_p).collect()}
    for i, p in enumerate(ppms):
        ref = mc.ppm_features(p)
        assert (got_p[i]["width"], got_p[i]["height"]) == (ref["width"], ref["height"])
        assert abs(got_p[i]["luma_std"] - ref["luma_std"]) < 1e-12
    got_r = {
        r["media_id"]: r
        for r in mm.resize_ppm_images(media_p, 3, 3).collect()
    }
    for i, p in enumerate(ppms):
        assert bytes(got_r[i]["resized"]) == mc.resize_ppm(p, 3, 3)


def test_corrupt_payloads_quarantine_not_crash(spark):
    """A corrupt payload among good ones yields a null feature row with
    decode_err set — the task (and job) survives, mirroring the
    PERMISSIVE corrupt-record policy of the file sources."""
    rows = [
        (0, "audio", make_wav(seconds=0.25)),
        (1, "audio", b"garbage not riff"),
        (2, "audio", make_wav(seconds=0.25)[:30]),  # truncated header
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )
    got = {r["media_id"]: r for r in mm.extract_wav_features(media).collect()}
    assert got[0]["decode_err"] is None and got[0]["duration_ms"] == 250
    assert got[1]["decode_err"] is not None and got[1]["rms"] is None
    assert got[2]["decode_err"] is not None

    imgs = [(0, "image", make_ppm(3, 3)), (1, "image", b"\x89PNG not ppm")]
    media_p = spark.createDataFrame(
        imgs, "media_id long, kind string, content binary"
    )
    got_p = {r["media_id"]: r for r in mm.extract_ppm_features(media_p).collect()}
    assert got_p[0]["decode_err"] is None and got_p[0]["width"] == 3
    assert got_p[1]["decode_err"] is not None and got_p[1]["width"] is None


def test_dhash_twins_and_near_twins(spark):
    """An edit to an UNSAMPLED pixel leaves the dHash bit-identical
    (hamming 0); whiting out sampled pixel (0,0) flips at most the one
    comparison bit it participates in (hamming <= 1)."""
    import numpy as np
    import pandas as pd

    from django_datastream_spark.operators.media_codecs import (
        encode_ppm,
        ppm_dhash_chunks,
    )
    from django_datastream_spark.operators.multimodal import (
        dhash_near_pairs,
        image_dhash_chunks,
    )

    h, w = 16, 32
    r = np.arange(h).reshape(h, 1, 1)
    c = np.arange(w).reshape(1, w, 1)
    k = np.arange(3).reshape(1, 1, 3)
    base = (r * 3 + c * 5 + k * 11) % 256
    twin = base.copy()
    twin[1, 1, 1] = (twin[1, 1, 1] + 50) % 256     # unsampled pixel
    near = base.copy()
    near[0, 0, :] = 255                            # sampled pixel
    far = (base + 97) % 256                        # different image

    # pure-python law: chunk function agrees with the planted design
    assert ppm_dhash_chunks(encode_ppm(base)) == ppm_dhash_chunks(
        encode_ppm(twin)
    )

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0, 1, 2],
                "content": [
                    encode_ppm(base),
                    encode_ppm(twin),
                    encode_ppm(near),
                ],
            }
        )
    )
    pairs = {
        (p["a"], p["b"]): p["hamming"]
        for p in dhash_near_pairs(image_dhash_chunks(media)).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] <= 1
    # corrupt payload quarantines instead of failing the job
    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [9], "content": [b"JUNK"]})
    )
    rows = image_dhash_chunks(bad).collect()
    assert rows[0]["k"] == -1 and rows[0]["decode_err"]


def test_pvm_container_roundtrip_and_seek(spark):
    import numpy as np
    import pandas as pd

    from django_datastream_spark.operators.media_codecs import (
        encode_pvm,
        parse_pvm_index,
        pvm_frame,
    )
    from django_datastream_spark.operators.multimodal import (
        sample_frames_real,
    )

    frames = [
        (np.arange(16 * 32 * 3).reshape(16, 32, 3) + 7 * f) % 256
        for f in range(5)
    ]
    payload = encode_pvm(frames, fps=2)
    n, fps, idx = parse_pvm_index(payload)
    assert (n, fps, len(idx)) == (5, 2, 5)
    # seek decodes exactly the requested frame
    assert (pvm_frame(payload, 3) == frames[3]).all()
    # truncated payload raises (→ quarantined in the Spark path)
    try:
        parse_pvm_index(payload[:-10])
        raise AssertionError("expected truncation error")
    except ValueError:
        pass

    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2], "content": [payload, b"JUNK"]}
        )
    )
    rows = sample_frames_real(media, every_ms=1000, max_frames=8).collect()
    good = [r for r in rows if r["media_id"] == 1]
    bad = [r for r in rows if r["media_id"] == 2]
    # 5 frames @2fps = 2500ms; sampled at 0,1000,2000 → frames 0,2,4
    assert [(r["frame_idx"], r["frame_ms"]) for r in good] == [
        (0, 0), (2, 1000), (4, 2000),
    ]
    assert bad[0]["frame_idx"] == -1 and bad[0]["decode_err"]


# ---------------------------------------------------------------------------
# PNG — the real compressed-format codec (stdlib zlib DEFLATE)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("nch", [1, 2, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_colortype(nch, ft):
    rng = np.random.default_rng(nch * 10 + ft)
    a = rng.integers(0, 256, size=(13, 17, nch), dtype=np.uint8)
    out = mc.parse_png(mc.encode_png(a, ft))
    assert out.shape == a.shape
    assert (out == a).all()


def test_png_palette_decode():
    import zlib

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(9, 11), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(9))

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    p = (
        mc.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 11, 9, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (mc.parse_png(p) == pal[idx]).all()


def test_png_crc_and_truncation_rejected():
    a = np.zeros((4, 4, 3), np.uint8)
    p = bytearray(mc.encode_png(a, 2))
    # flip one IDAT byte -> CRC check must catch it
    p[len(mc.PNG_SIG) + 8 + 13 + 4 + 8] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mc.parse_png(bytes(p))
    with pytest.raises(ValueError):
        mc.parse_png(mc.encode_png(a)[:-6])  # missing IEND
    with pytest.raises(ValueError, match="not a PNG"):
        mc.parse_png(b"\x89PNX" + b"\x00" * 32)


def test_png_bad_interlace_and_depth_rejected():
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    for depth, interlace, msg in [
        (16, 0, "bit depth"),
        (8, 2, "interlace"),  # Adam7 (=1) is supported; method 2 is not
    ]:
        p = (
            mc.PNG_SIG
            + chunk(
                b"IHDR",
                struct.pack(">IIBBBBB", 2, 2, depth, 2, 0, 0, interlace),
            )
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match=msg):
            mc.parse_png(p)


@pytest.mark.parametrize("nch", [1, 2, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_adam7_roundtrip_every_filter_and_colortype(nch, ft):
    rng = np.random.default_rng(100 + nch * 10 + ft)
    a = rng.integers(0, 256, size=(13, 17, nch), dtype=np.uint8)
    p = mc.encode_png(a, ft, interlace=True)
    # IHDR interlace byte really is 1 (offset: sig + len + type + w/h/depth/ct/comp/filt)
    assert p[len(mc.PNG_SIG) + 8 + 12] == 1
    out = mc.parse_png(p)
    assert out.shape == a.shape and (out == a).all()


@pytest.mark.parametrize(
    "h,w",
    # every Adam7 edge class: sub-8x8 images where whole passes are empty,
    # single row/column, exact pass-grid multiples, and odd remainders
    [(1, 1), (1, 9), (9, 1), (2, 3), (4, 4), (7, 5), (8, 8), (9, 10), (16, 16)],
)
def test_png_adam7_odd_dimensions(h, w):
    rng = np.random.default_rng(h * 100 + w)
    a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (mc.parse_png(mc.encode_png(a, 4, interlace=True)) == a).all()


def test_png_adam7_matches_sequential_decode():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(21, 19, 3), dtype=np.uint8)
    seq = mc.parse_png(mc.encode_png(a, 2))
    ilc = mc.parse_png(mc.encode_png(a, 2, interlace=True))
    assert (seq == ilc).all()


def test_png_adam7_truncated_pass_rejected():
    import zlib

    a = np.zeros((9, 9, 3), np.uint8)
    p = bytearray(mc.encode_png(a, 0, interlace=True))
    # rebuild with one byte shaved off the raw (pre-DEFLATE) stream:
    # decode chunks, deflate a shorter stream, re-chunk
    raw = zlib.decompress(
        b"".join(d for t, d in mc._png_chunks(bytes(p)) if t == b"IDAT")
    )

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    short = (
        mc.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(raw[:-1]))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="Adam7|IDAT size"):
        mc.parse_png(short)


def test_png_features_match_ppm_features_same_pixels():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    fp = mc.png_features(mc.encode_png(a, 4))
    fq = mc.ppm_features(mc.encode_ppm(a))
    assert fp == pytest.approx(fq)


def test_png_gray_transcode_luma_identity():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    ppm = mc.png_to_ppm(mc.encode_png(g, 1))
    arr = mc.parse_ppm(ppm)
    assert (arr[..., 0] == g).all() and (arr == arr[..., :1]).all()
    # BT.601 weights sum to 1, so luma of replicated gray == gray
    f = mc.ppm_features(ppm)
    assert f["luma_mean"] == pytest.approx(float(g.mean()))


def test_spark_png_stages_match_pure_functions(spark):
    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8) for _ in range(5)
    ]
    rows = [
        (i, bytearray(mc.encode_png(a, i % 5))) for i, a in enumerate(imgs)
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    feats = {
        r["media_id"]: r.asDict()
        for r in mm.extract_png_features(media).collect()
    }
    for i, a in enumerate(imgs):
        want = mc.png_features(mc.encode_png(a))
        got = feats[i]
        assert got["decode_err"] is None
        for k, v in want.items():
            assert got[k] == pytest.approx(v), (i, k)
    # transcode feeds the existing PPM dhash path unchanged
    ppm = mm.transcode_png_to_ppm(media)
    chunks = mm.image_dhash_chunks(
        ppm.select("media_id", "content")
    ).collect()
    by_id = {}
    for r in chunks:
        assert r["decode_err"] is None
        by_id.setdefault(r["media_id"], {})[r["k"]] = r["v"]
    for i, a in enumerate(imgs):
        assert [by_id[i][k] for k in range(4)] == mc.ppm_dhash_chunks(
            mc.encode_ppm(a)
        )


def test_png_corrupt_payload_quarantines_in_spark(spark):
    good = mc.encode_png(np.zeros((3, 3, 3), np.uint8), 0)
    media = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(b"not a png"))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in mm.extract_png_features(media).collect()}
    assert rows[0]["decode_err"] is None
    assert rows[1]["decode_err"] is not None and rows[1]["width"] is None


# ---------------------------------------------------------------------------
# PNG property tests (hypothesis): roundtrip law + decoder totality
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=40, deadline=None)
@given(
    h=hst.integers(1, 24),
    w=hst.integers(1, 24),
    nch=hst.sampled_from([1, 2, 3, 4]),
    ft=hst.integers(0, 4),
    seed=hst.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, nch, ft, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
    assert (mc.parse_png(mc.encode_png(a, ft)) == a).all()


@settings(max_examples=60, deadline=None)
@given(data=hst.binary(max_size=400))
def test_png_decoder_total_on_garbage(data):
    """parse_png over arbitrary bytes must either decode or raise
    ValueError — never IndexError/struct.error/segfault-shaped
    surprises (the quarantine path in multimodal catches ValueError
    by contract)."""
    try:
        mc.parse_png(data)
    except ValueError:
        pass
    try:  # also with a valid signature grafted on
        mc.parse_png(mc.PNG_SIG + data)
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(data=hst.binary(max_size=300))
def test_png_truncation_total(data):
    """Truncating a VALID png anywhere must raise ValueError or
    (for truncations past IEND-start that keep the stream whole)
    still decode the same pixels — never crash."""
    a = (np.arange(60, dtype=np.uint8).reshape(5, 4, 3) * 3) % 256
    p = mc.encode_png(a, 2)
    cut = len(data) % len(p)
    try:
        out = mc.parse_png(p[:cut])
        assert (out == a).all()  # only reachable if stream was whole
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# baseline JPEG — the real from-first-principles codec
# ---------------------------------------------------------------------------
from django_datastream_spark.operators import jpeg_codec as jc


def test_jpeg_flat_image_roundtrips_within_one():
    # a flat block is DC-only; quantized DC rounds within half a step
    for v in (0, 77, 128, 255):
        out = jc.parse_jpeg(jc.encode_jpeg(np.full((8, 8), v, np.uint8)))
        assert np.abs(out.astype(int) - v).max() <= 1, v


def test_jpeg_planted_coefficients_decode_exactly():
    """Coefficients planted POST-quantization survive losslessly:
    decode == clip(floor(IDCT(K*Q) + 128.5)) to the bit — the law
    q168's oracle leans on."""
    rng = np.random.default_rng(0)
    q = np.zeros((2, 3, 8, 8), np.int64)
    q[..., 0, 0] = rng.integers(-5, 6, (2, 3))
    q[..., 0, 1] = rng.integers(-3, 4, (2, 3))
    q[..., 2, 2] = rng.integers(-2, 3, (2, 3))
    dec = jc.parse_jpeg(jc.encode_gray_from_coeffs(q))
    exp = np.zeros((16, 24))
    for by in range(2):
        for bx in range(3):
            exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                jc.idct2(q[by, bx] * jc.QUANT_LUMA) + 128
            )
    exp = np.clip(np.floor(exp + 0.5), 0, 255).astype(np.uint8)
    assert dec.shape == (16, 24) and (dec == exp).all()


def test_jpeg_smooth_images_roundtrip_tightly():
    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    smooth = ((xx * 3 + yy * 2) % 200 + 20).astype(np.uint8)
    back = jc.parse_jpeg(jc.encode_jpeg(smooth))
    d = np.abs(back.astype(int) - smooth.astype(int))
    assert d.mean() < 2 and d.max() <= 6
    rgb = np.stack([smooth, smooth[::-1], np.roll(smooth, 5, 1)], axis=-1)
    back3 = jc.parse_jpeg(jc.encode_jpeg(rgb))
    d3 = np.abs(back3.astype(int) - rgb.astype(int))
    assert d3.mean() < 4 and back3.shape == rgb.shape


def test_jpeg_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (13, 21), np.uint8)
    out = jc.parse_jpeg(jc.encode_jpeg(a))
    assert out.shape == (13, 21)


def test_jpeg_rejects_unsupported_modes():
    good = bytearray(jc.encode_jpeg(np.zeros((8, 8), np.uint8)))
    with pytest.raises(ValueError, match="no SOI"):
        jc.parse_jpeg(b"GIF89a")
    # flip SOF0 -> SOF2: now a progressive frame whose (baseline-shaped)
    # scan header Ss=0/Se=63 is illegal — DC and AC never share a
    # progressive scan (T.81 G.1.1.1.1)
    i = bytes(good).find(b"\xff\xc0")
    prog = good.copy()
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        jc.parse_jpeg(bytes(prog))
    # SOF1 (extended sequential) stays out of scope
    seq = good.copy()
    seq[i + 1] = 0xC1
    with pytest.raises(ValueError, match="SOF0 / progressive SOF2"):
        jc.parse_jpeg(bytes(seq))
    with pytest.raises(ValueError, match="missing EOI"):
        jc.parse_jpeg(bytes(good[:-2]))


def test_jpeg_progressive_matches_baseline_exactly():
    """Progressive transmission is coefficient-lossless: SOF2 with the
    full scan script (DC first/refine at Al=1, AC first/refine with
    EOB runs and correction bits) decodes bit-identically to the SOF0
    encoding of the same image."""
    rng = np.random.default_rng(11)
    for shape in ((8, 8), (13, 21), (24, 32)):
        a = rng.integers(0, 256, shape, np.uint8)
        base = jc.parse_jpeg(jc.encode_jpeg(a))
        prog = jc.parse_jpeg(jc.encode_jpeg(a, progressive=True))
        assert (base == prog).all(), shape
    rgb = rng.integers(0, 256, (17, 19, 3), np.uint8)
    base3 = jc.parse_jpeg(jc.encode_jpeg(rgb))
    prog3 = jc.parse_jpeg(jc.encode_jpeg(rgb, progressive=True))
    assert (base3 == prog3).all()


def test_jpeg_progressive_planted_coefficients_decode_exactly():
    """The q183 law: planted post-quantization coefficients survive
    the SOF2 scan script losslessly, so decode == the closed-form
    IDCT — including negatives (sign bits + two's-complement
    refinement) and sparse high-frequency positions (EOB runs)."""
    rng = np.random.default_rng(7)
    q = np.zeros((3, 4, 8, 8), np.int64)
    q[..., 0, 0] = rng.integers(-6, 7, (3, 4))
    q[..., 0, 1] = rng.integers(-3, 4, (3, 4))
    q[..., 3, 5] = rng.integers(-2, 3, (3, 4))
    q[..., 7, 7] = rng.integers(-1, 2, (3, 4))  # deep-band: long runs
    dec_b = jc.parse_jpeg(jc.encode_gray_from_coeffs(q))
    dec_p = jc.parse_jpeg(jc.encode_gray_from_coeffs(q, progressive=True))
    assert (dec_b == dec_p).all()


def test_jpeg_progressive_eobrun_spans_blocks():
    # all-zero AC everywhere except one late block: the AC-first scan
    # must code one multi-block EOB run and the decoder must skip
    # exactly that many blocks
    q = np.zeros((2, 8, 8, 8), np.int64)
    q[..., 0, 0] = 3
    q[1, 6, 2, 2] = -2
    dec_b = jc.parse_jpeg(jc.encode_gray_from_coeffs(q))
    dec_p = jc.parse_jpeg(jc.encode_gray_from_coeffs(q, progressive=True))
    assert (dec_b == dec_p).all()


def test_jpeg_spark_stage_and_quarantine(spark):
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (9, 14, 3), np.uint8) for _ in range(3)]
    rows = [(i, bytearray(jc.encode_jpeg(a))) for i, a in enumerate(imgs)]
    rows.append((99, bytearray(b"not a jpeg")))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: r.asDict()
        for r in mm.extract_jpeg_features(media).collect()
    }
    for i, a in enumerate(imgs):
        dec = jc.parse_jpeg(jc.encode_jpeg(a)).astype(np.float64)
        assert got[i]["decode_err"] is None
        assert got[i]["width"] == 14 and got[i]["height"] == 9
        assert got[i]["mean_r"] == pytest.approx(dec[..., 0].mean())
    assert got[99]["decode_err"] is not None and got[99]["width"] is None


@settings(max_examples=30, deadline=None)
@given(data=hst.binary(max_size=300))
def test_jpeg_decoder_total_on_garbage(data):
    for payload in (data, b"\xff\xd8" + data):
        try:
            jc.parse_jpeg(payload)
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# GIF87a — real variable-width LZW, lossless roundtrip laws
# ---------------------------------------------------------------------------
def test_gif_roundtrip_exact_and_12bit_reset():
    rng = np.random.default_rng(1)
    for shape, ncol in (((5, 7), 4), ((16, 24), 200), ((1, 1), 1)):
        pal = rng.integers(0, 256, (ncol, 3), np.uint8)
        img = pal[rng.integers(0, ncol, shape)]
        back = mc.parse_gif(mc.encode_gif(img))
        assert back.shape == img.shape and (back == img).all(), shape
    # 14400 random pixels push the LZW table past 4096 -> clear/reset
    pal = np.unique(rng.integers(0, 256, (256, 3), np.uint8), axis=0)
    noise = pal[rng.integers(0, len(pal), (120, 120))]
    assert (mc.parse_gif(mc.encode_gif(noise)) == noise).all()


@pytest.mark.parametrize("h,w", [(1, 3), (2, 3), (3, 2), (7, 5), (8, 8), (17, 9)])
def test_gif_interlaced_roundtrip(h, w):
    rng = np.random.default_rng(h * 31 + w)
    pal = rng.integers(0, 256, (8, 3), np.uint8)
    img = pal[rng.integers(0, 8, (h, w))]
    p = mc.encode_gif(img, interlace=True)
    # image descriptor flag byte carries the interlace bit
    gct = 2 << (p[10] & 0x07)
    assert p[13 + gct * 3 + 9] & 0x40
    assert (mc.parse_gif(p) == img).all()
    # row storage order really is the 4-pass permutation
    order = mc._gif_interlace_order(h)
    assert sorted(order) == list(range(h)) and (
        h < 3 or order != list(range(h))  # identity only below 3 rows
    )


def test_gif_rejects_invalid():
    with pytest.raises(ValueError, match="not a GIF"):
        mc.parse_gif(b"PNG...")
    rng = np.random.default_rng(2)
    too_many = rng.integers(0, 256, (40, 40, 3), np.uint8)
    if len(np.unique(too_many.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="distinct colors"):
            mc.encode_gif(too_many)
    good = mc.encode_gif(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        mc.parse_gif(good[:20])


def test_gif_skips_89a_extension_blocks():
    img = np.full((3, 3, 3), 9, np.uint8)
    p = bytearray(mc.encode_gif(img))
    # graft a GIF89a graphic-control extension after the color table
    # (header 13 + 2-entry palette 6 bytes)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ins = 13 + 6
    p89 = b"GIF89a" + bytes(p[6:ins]) + ext + bytes(p[ins:])
    assert (mc.parse_gif(p89) == img).all()


def test_gif_spark_stage_matches_pure(spark):
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (30, 3), np.uint8)
    imgs = [pal[rng.integers(0, 30, (6, 9))] for _ in range(4)]
    rows = [(i, bytearray(mc.encode_gif(a))) for i, a in enumerate(imgs)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    feats = {
        r["media_id"]: r.asDict()
        for r in mm.extract_gif_features(media).collect()
    }
    for i, a in enumerate(imgs):
        got = feats[i]
        assert got["decode_err"] is None
        assert got["mean_r"] == pytest.approx(float(a[..., 0].mean()))


@settings(max_examples=40, deadline=None)
@given(data=hst.binary(max_size=300))
def test_gif_decoder_total_on_garbage(data):
    for payload in (data, b"GIF87a" + data):
        try:
            mc.parse_gif(payload)
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# FLAC — real Rice/LPC lossless codec, exact round-trip laws
# ---------------------------------------------------------------------------
from django_datastream_spark.operators import flac_codec as fl


def test_flac_roundtrips_exactly_across_shapes():
    rng = np.random.default_rng(3)
    cases = [
        (rng.integers(-32768, 32768, 5000), 44100, 16, 1024),  # noise
        (np.full(3000, -123), 8000, 16, 512),                  # constant
        ((10000 * np.sin(np.arange(7000) * 0.01)).astype(int), 48000, 16, 4096),
        (rng.integers(-128, 128, 700), 16000, 8, 256),
        (rng.integers(-(1 << 23), 1 << 23, 900), 96000, 24, 256),
        (rng.integers(-32768, 32768, 1), 44100, 16, 4096),     # single sample
    ]
    for x, sr, bps, bs in cases:
        x = np.asarray(x, np.int64)
        p = fl.encode_flac(x, sr, bps=bps, block_size=bs)
        gsr, gch, y = fl.parse_flac(p)
        assert gsr == sr and gch == 1 and (y == x).all(), (bps, bs)


def test_flac_stereo_modes_agree():
    rng = np.random.default_rng(5)
    t = np.arange(5000)
    l = (9000 * np.sin(t * 0.011)).astype(np.int64)
    noisy = np.stack([l, l + rng.integers(-40, 40, len(t))], axis=1)
    ident = np.stack([l, l], axis=1)
    for st in (noisy, ident):
        ms = fl.encode_flac(st, 44100, mid_side=True)
        ind = fl.encode_flac(st, 44100, mid_side=False)
        for p in (ms, ind):
            sr, ch, y = fl.parse_flac(p)
            assert ch == 2 and (y.reshape(-1, 2) == st).all()
        # decorrelation planning considers independent too, so it can
        # never lose; identical channels make it win outright (side is
        # a CONSTANT-zero subframe)
        assert len(ms) <= len(ind)
    assert len(fl.encode_flac(ident, 44100, mid_side=True)) < len(
        fl.encode_flac(ident, 44100, mid_side=False)
    )


def test_flac_left_right_side_decode():
    """The encoder emits mid/side; hand-build left/side and right/side
    frames by patching the channel assignment is fragile — instead
    round-trip through the decoder law: decode(mid/side) equals the
    original, and a stream re-encoded independent decodes identically
    (the two decorrelation paths already covered); left/side and
    right/side are pinned by construction below via subframe algebra."""
    # exercise the decoder's left/side + right/side reconstructions by
    # crafting a 1-block stream manually from the encoder's pieces
    rng = np.random.default_rng(8)
    left = rng.integers(-2000, 2000, 512).astype(np.int64)
    right = left + rng.integers(-30, 30, 512)

    for mode_code, ch0, ch1, bps0, bps1 in (
        (0b1000, left, left - right, 16, 17),   # left/side
        (0b1001, left - right, right, 17, 16),  # right/side
    ):
        hdr = fl._BitWriter()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 2)
        hdr.put(0b0111, 4)
        hdr.put(0b0000, 4)
        hdr.put(mode_code, 4)
        hdr.put(0b100, 3)
        hdr.put(0, 1)
        hdr.align()
        head = bytes(hdr.out) + fl._coded_number(0)
        import struct as _st

        head += _st.pack(">H", 511)
        head += bytes([fl.crc8(head)])
        w = fl._BitWriter()
        fl._write_subframe(w, ch0, bps0, 512, True)
        fl._write_subframe(w, ch1, bps1, 512, True)
        w.align()
        frame = head + w.bytes()
        frame += _st.pack(">H", fl.crc16(frame))

        si = fl._BitWriter()
        si.put(512, 16)
        si.put(512, 16)
        si.put(0, 48)
        si.put(44100, 20)
        si.put(1, 3)  # 2 channels
        si.put(15, 5)  # 16 bps
        si.put(512, 36)
        si.align()
        payload = (
            b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
            + si.bytes() + b"\x00" * 16 + frame
        )
        sr, ch, y = fl.parse_flac(payload)
        got = y.reshape(-1, 2)
        assert (got[:, 0] == left).all() and (got[:, 1] == right).all(), (
            mode_code
        )


def test_flac_crc_and_md5_are_verified():
    x = np.arange(-500, 500, dtype=np.int64) * 13 % 4001 - 2000
    p = bytearray(fl.encode_flac(x, 22050, block_size=256))
    # flip a bit inside frame data (past 42-byte header zone)
    p2 = p.copy()
    p2[80] ^= 0x10
    with pytest.raises(ValueError):
        fl.parse_flac(bytes(p2))
    # corrupt the STREAMINFO md5: frames decode, whole-stream check fires
    p3 = p.copy()
    p3[26] ^= 0xFF  # inside the 16 md5 bytes (STREAMINFO body 8+18..8+34)
    with pytest.raises(ValueError, match="MD5"):
        fl.parse_flac(bytes(p3))
    assert (fl.parse_flac(bytes(p))[2] == x).all()


def test_flac_rejects_unsupported_and_is_total():
    with pytest.raises(ValueError, match="fLaC"):
        fl.parse_flac(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        fl.encode_flac(np.zeros((0,)), 44100)
    with pytest.raises(ValueError, match="range"):
        fl.encode_flac(np.array([40000]), 44100, bps=16)


@settings(max_examples=40, deadline=None)
@given(data=hst.binary(max_size=400))
def test_flac_decoder_total_on_garbage(data):
    for payload in (data, b"fLaC" + data):
        try:
            fl.parse_flac(payload)
        except ValueError:
            pass


@settings(max_examples=15, deadline=None)
@given(
    n=hst.integers(1, 3000),
    seed=hst.integers(0, 10_000),
    bs=hst.sampled_from([192, 256, 576, 1024, 4096]),
    ch=hst.integers(1, 2),
)
def test_flac_roundtrip_property(n, seed, bs, ch):
    rng = np.random.default_rng(seed)
    kind = seed % 3
    if kind == 0:
        x = rng.integers(-32768, 32768, (n, ch))
    elif kind == 1:  # smooth
        t = np.arange(n)[:, None]
        x = (
            12000 * np.sin(t * (0.002 + 0.01 * rng.random(ch))[None, :])
        ).astype(np.int64)
    else:  # piecewise constant with spikes
        x = np.repeat(
            rng.integers(-3000, 3000, ((n + 49) // 50, ch)), 50, axis=0
        )[:n]
        if n > 10:
            x[rng.integers(0, n, 5)] = rng.integers(-32768, 32768, (5, ch))
    x = np.asarray(x, np.int64).reshape(n, ch)
    p = fl.encode_flac(x, 44100, block_size=bs)
    sr, gch, y = fl.parse_flac(p)
    assert gch == ch and (y.reshape(-1, ch) == x).all()


def test_flac_spark_stage_and_quarantine(spark):
    rng = np.random.default_rng(2)
    sigs = [
        (3000 * np.sin(np.arange(2000) * (0.01 + 0.003 * i))).astype(np.int64)
        for i in range(3)
    ]
    rows = [
        (i, bytearray(fl.encode_flac(s, 16000, block_size=512)))
        for i, s in enumerate(sigs)
    ]
    rows.append((99, bytearray(b"not a flac")))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: r.asDict()
        for r in mm.extract_flac_features(media).collect()
    }
    for i, s in enumerate(sigs):
        xf = s / 32768.0
        assert got[i]["decode_err"] is None
        assert got[i]["sample_rate"] == 16000
        assert got[i]["duration_ms"] == 125
        assert got[i]["rms"] == pytest.approx(float(np.sqrt(np.mean(xf**2))))
    assert got[99]["decode_err"] is not None and got[99]["rms"] is None


# ---------------------------------------------------------------------------
# BMP — 24-bit + paletted RLE8, lossless round-trip laws
# ---------------------------------------------------------------------------
def test_bmp_24bit_roundtrip_and_padding():
    rng = np.random.default_rng(6)
    for shape in ((7, 11, 3), (1, 1, 3), (5, 4, 3)):  # odd + aligned strides
        a = rng.integers(0, 256, shape, np.uint8)
        assert (mc.parse_bmp(mc.encode_bmp(a)) == a).all(), shape


def test_bmp_rle8_runs_absolute_and_alignment():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (40, 3), np.uint8)
    # long runs, literal stretches (odd + even lengths), 255+ runs
    ix = np.zeros((6, 300), np.uint8)
    ix[0] = 5  # 300-long run: splits at 255
    ix[1, :7] = [1, 2, 3, 4, 5, 6, 7]  # odd absolute chunk (padding)
    ix[2, :4] = [8, 9, 10, 11]  # even absolute chunk
    ix[3] = np.arange(300) % 37  # long literal: 255-chunk + tail
    ix[4, ::2] = 3  # alternating: short runs
    dec = mc.parse_bmp(mc.encode_bmp_rle8(ix, pal))
    assert (dec == pal[ix]).all()


def test_bmp_rle8_delta_escape_decodes():
    # hand-build a stream using the delta escape (encoder never emits
    # it): 4x4, run of 2, delta (+1, +2), run of 1, EOB
    pal = np.zeros((256, 3), np.uint8)
    pal[7] = (255, 0, 0)
    pal[9] = (0, 255, 0)
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal.tolist())
    stream = bytes([2, 7, 0, 2, 1, 2, 1, 9, 0, 1])
    payload = mc._bmp_headers(4, 4, 8, 1, len(stream), pal_bytes) + stream
    img = mc.parse_bmp(payload)
    assert (img[3, 0] == (255, 0, 0)).all() and (img[3, 1] == (255, 0, 0)).all()
    assert (img[1, 3] == (0, 255, 0)).all()  # bottom-up: y=2 -> row 1
    assert (img[0] == 0).all()


def test_bmp_top_down_and_rejections():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, (3, 5, 3), np.uint8)
    p = bytearray(mc.encode_bmp(a))
    import struct as _st

    # flip height negative (top-down) and reverse rows: same image
    p2 = bytearray(p)
    p2[22:26] = _st.pack("<i", -3)
    rows = mc.parse_bmp(bytes(p2))
    assert (rows == a[::-1]).all()
    with pytest.raises(ValueError, match="not a BMP"):
        mc.parse_bmp(b"PNG?")
    bad = bytearray(p)
    bad[28] = 16  # bpp 16
    with pytest.raises(ValueError, match="unsupported BMP"):
        mc.parse_bmp(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        mc.parse_bmp(bytes(p[:-4]))


@settings(max_examples=40, deadline=None)
@given(data=hst.binary(max_size=300))
def test_bmp_decoder_total_on_garbage(data):
    for payload in (data, b"BM" + data):
        try:
            mc.parse_bmp(payload)
        except ValueError:
            pass


def test_bmp_spark_stage(spark):
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (6, 9, 3), np.uint8) for _ in range(3)]
    rows = [(i, bytearray(mc.encode_bmp(a))) for i, a in enumerate(imgs)]
    rows.append((99, bytearray(b"junk")))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: r.asDict()
        for r in mm.extract_image_features(media, "bmp").collect()
    }
    for i, a in enumerate(imgs):
        assert got[i]["decode_err"] is None
        assert (got[i]["width"], got[i]["height"]) == (9, 6)
        assert got[i]["mean_g"] == pytest.approx(float(a[..., 1].mean()))
    assert got[99]["decode_err"] is not None


# ---------------------------------------------------------------------------
# cross-format confusion: every parser rejects every OTHER format
# ---------------------------------------------------------------------------
def _format_zoo():
    """One small VALID payload per format we can synthesize."""
    import io as _io
    import wave as _wave

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (6, 8, 3), np.uint8)
    gray = rng.integers(0, 256, (8, 8), np.uint8)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    ix = rng.integers(0, 16, (6, 8), np.uint8)
    pcm = rng.integers(-3000, 3000, 500).astype(np.int64)
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())

    from django_datastream_spark.operators import flac_codec as _fl
    from django_datastream_spark.operators import jpeg_codec as _jc
    from django_datastream_spark.operators import pdf_codec as _pc
    from django_datastream_spark.sources import tar as _wds
    from django_datastream_spark.sources import warc as _warc

    return {
        "ppm": mc.encode_ppm(img),
        "png": mc.encode_png(img),
        "gif": mc.encode_gif(img),
        "bmp": mc.encode_bmp(img),
        "bmp_rle": mc.encode_bmp_rle8(ix, pal),
        "jpeg": _jc.encode_jpeg(gray),
        "jpeg_prog": _jc.encode_jpeg(gray, progressive=True),
        "wav": buf.getvalue(),
        "flac": _fl.encode_flac(pcm, 8000, block_size=256),
        "pdf": _pc.build_simple_pdf([["hello"]]),
        "warc": _warc.build_warc(
            [{"warc_type": "resource", "target_uri": "http://x/1",
              "content_type": "application/octet-stream",
              "body": b"abc"}]
        ),
        "tar": _wds.build_webdataset([("0.txt", b"abc")]),
        "zip": _wds.build_zip_shard([("0.txt", b"abc")]),
        "tiff": mc.encode_tiff(img, "lzw"),
    }


def test_cross_format_confusion_matrix():
    """Feed every format's VALID bytes to every OTHER parser: the
    wrong parser must raise ValueError — never crash with a raw
    exception, hang, or silently 'succeed' on foreign data. (tar is
    the one honest exception: a tar archive is unmagic'd, so formats
    with leading free-form bytes can't be told apart — the zoo has no
    such collision.)"""
    from django_datastream_spark.operators import flac_codec as _fl
    from django_datastream_spark.operators import jpeg_codec as _jc
    from django_datastream_spark.operators import pdf_codec as _pc
    from django_datastream_spark.sources import tar as _wds
    from django_datastream_spark.sources import warc as _warc

    parsers = {
        "tiff": mc.parse_tiff,
        "ppm": mc.parse_ppm,
        "png": mc.parse_png,
        "gif": mc.parse_gif,
        "bmp": mc.parse_bmp,
        "jpeg": _jc.parse_jpeg,
        "wav": mc.parse_wav,
        "flac": _fl.parse_flac,
        "pdf": _pc.extract_pdf_text,
        "warc": _warc.parse_warc,
        "zip": _wds.parse_zip_shard,
        "tar": _wds.parse_webdataset,
    }
    accepts = {  # parser -> zoo keys it legitimately accepts
        "tiff": {"tiff"},
        "ppm": {"ppm"}, "png": {"png"}, "gif": {"gif"},
        "bmp": {"bmp", "bmp_rle"}, "jpeg": {"jpeg", "jpeg_prog"},
        "wav": {"wav"}, "flac": {"flac"}, "pdf": {"pdf"},
        "warc": {"warc"}, "zip": {"zip"}, "tar": {"tar"},
    }
    zoo = _format_zoo()
    for pname, parse in parsers.items():
        for fmt, payload in zoo.items():
            if fmt in accepts[pname]:
                parse(payload)  # must succeed
                continue
            with pytest.raises(ValueError):
                parse(payload)


def test_jpeg_restart_markers_roundtrip_and_verify():
    """DRI/RSTn both directions: encodings with any restart interval
    decode identically to the unmarked encoding (predictor resets and
    byte alignment are transparent), in BOTH modes; a wrong marker
    index at a boundary is a hard error, not a resync guess."""
    rng = np.random.default_rng(12)
    a = rng.integers(0, 256, (24, 40), np.uint8)
    for prog in (False, True):
        base = jc.parse_jpeg(jc.encode_jpeg(a, progressive=prog))
        for ri in (1, 3, 7):
            p = jc.encode_jpeg(a, progressive=prog, restart_interval=ri)
            assert (jc.parse_jpeg(p) == base).all(), (prog, ri)
    rgb = rng.integers(0, 256, (17, 19, 3), np.uint8)
    b0 = jc.parse_jpeg(jc.encode_jpeg(rgb))
    assert (jc.parse_jpeg(
        jc.encode_jpeg(rgb, restart_interval=2)
    ) == b0).all()
    assert (jc.parse_jpeg(
        jc.encode_jpeg(rgb, progressive=True, restart_interval=2)
    ) == b0).all()
    # corrupt the FIRST restart marker's index (FFD0 -> FFD5)
    p = bytearray(jc.encode_jpeg(a, restart_interval=2))
    i = bytes(p).find(b"\xff\xd0")
    assert i > 0
    p[i + 1] = 0xD5
    with pytest.raises(ValueError, match="RST"):
        jc.parse_jpeg(bytes(p))


# ---------------------------------------------------------------------------
# TIFF — strips with none/PackBits/LZW(early-change), lossless laws
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
def test_tiff_roundtrip_all_compressions(comp):
    rng = np.random.default_rng(13)
    for shape in ((13, 21, 3), (9, 30), (1, 1, 3)):
        a = rng.integers(0, 256, shape, np.uint8)
        assert (mc.parse_tiff(mc.encode_tiff(a, comp)) == a).all(), (
            comp, shape,
        )
    # runs (PackBits pay-off) and multi-strip boundaries
    runs = np.repeat(
        rng.integers(0, 8, (16, 10, 3)), 5, axis=1
    )[:, :40].astype(np.uint8)
    assert (mc.parse_tiff(
        mc.encode_tiff(runs, comp, rows_per_strip=3)
    ) == runs).all()


def test_tiff_lzw_width_growth_and_reset():
    # large random plane forces 9->10->11->12-bit codes AND a table
    # reset (encoder Clear at 4094): any early-change off-by-one
    # desyncs immediately
    rng = np.random.default_rng(14)
    big = rng.integers(0, 256, (120, 90, 3), np.uint8)
    p = mc.encode_tiff(big, "lzw", rows_per_strip=120)
    assert (mc.parse_tiff(p) == big).all()


def test_tiff_big_endian_reads():
    # hand-flip: our encoder writes II; verify the parser handles MM
    # by reading a manually-built big-endian gray 2x2
    import struct as _st

    px = bytes([1, 2, 3, 4])
    ifd_off = 8
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, 2),
        (279, 4, 1, 4),
    ]
    ifd = _st.pack(">H", len(entries))
    data_off = 8 + 2 + 12 * len(entries) + 4
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = data_off
        if typ == 3:
            ifd += _st.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += _st.pack(">HHII", tag, typ, cnt, val)
    ifd += _st.pack(">I", 0)
    payload = b"MM\x00*" + _st.pack(">I", ifd_off) + ifd + px
    a = mc.parse_tiff(payload)
    assert a.shape == (2, 2) and a.tolist() == [[1, 2], [3, 4]]


def test_tiff_rejections_and_totality():
    with pytest.raises(ValueError, match="not a TIFF"):
        mc.parse_tiff(b"II+\x00garbage")
    a = np.zeros((4, 4, 3), np.uint8)
    p = bytearray(mc.encode_tiff(a, "none"))
    with pytest.raises(ValueError):
        mc.parse_tiff(bytes(p[:40]))


@settings(max_examples=30, deadline=None)
@given(data=hst.binary(max_size=300))
def test_tiff_total_on_garbage(data):
    for payload in (data, b"II*\x00" + data, b"MM\x00*" + data):
        try:
            mc.parse_tiff(payload)
        except ValueError:
            pass


@settings(max_examples=25, deadline=None)
@given(data=hst.binary(max_size=600))
def test_packbits_and_tiff_lzw_roundtrip_property(data):
    assert mc._packbits_decode(mc._packbits_encode(data), len(data)) == data
    assert mc._tiff_lzw_decode(mc._tiff_lzw_encode(data), len(data)) == data


def test_tiff_spark_stage(spark):
    rng = np.random.default_rng(15)
    imgs = [rng.integers(0, 256, (6, 9, 3), np.uint8) for _ in range(2)]
    rows = [
        (i, bytearray(mc.encode_tiff(a, ("lzw", "packbits")[i % 2])))
        for i, a in enumerate(imgs)
    ]
    rows.append((99, bytearray(b"junk")))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: r.asDict()
        for r in mm.extract_image_features(media, "tiff").collect()
    }
    for i, a in enumerate(imgs):
        assert got[i]["decode_err"] is None
        assert got[i]["mean_b"] == pytest.approx(float(a[..., 2].mean()))
    assert got[99]["decode_err"] is not None
