"""Multimodal columns (extension surface): image/audio/video as opaque
``binary`` payloads with typed metadata structs, processed by Arrow-batched
``mapInPandas`` stages.

Decode story, honestly split by format class:

- **Uncompressed self-describing formats are decoded for REAL**: WAV
  (RIFF/PCM16) and PPM (P6) need only struct+numpy — see
  ``extract_wav_features`` / ``extract_ppm_features`` /
  ``resize_ppm_images`` below and :mod:`media_codecs` (ground-truth
  signal tests in tests/test_media_codecs.py).
- **PNG is decoded for REAL too, compression included**: its entropy
  stage is DEFLATE, which the stdlib ``zlib`` provides, so
  ``extract_png_features`` / ``transcode_png_to_ppm`` run the genuine
  CRC-checked chunk walk + inflate + scanline-unfilter pipeline
  (:func:`media_codecs.parse_png`), oracle-verified end-to-end (q158).
- **GIF87a is decoded for REAL**: variable-width LZW from the spec
  (:func:`media_codecs.parse_gif`); palette encoding is lossless, so
  q169's closed-form oracle must match exactly.
- **Baseline JPEG is decoded for REAL as well**: the Huffman entropy
  coder, zigzag RLE, dequantization, and 8x8 IDCT are implemented from
  the spec in pure numpy (:mod:`jpeg_codec` — SOF0 baseline AND SOF2
  progressive with successive approximation, 8-bit, 4:4:4;
  subsampled/arithmetic files quarantine with the reason).
  ``extract_jpeg_features`` runs it; q168 pins the whole
  Huffman->dequant->IDCT path against an arithmetic oracle via
  exactly-representable planted coefficients.
- **BMP is decoded for REAL including RLE8** (:func:`media_codecs.parse_bmp`
  — run/absolute/delta escapes, q194's lossless palette oracle), and
  **FLAC is decoded for REAL** (:mod:`flac_codec` — Rice/LPC with
  CRC-8/16 + PCM-MD5 verification, q186); **PDF text** extracts via
  :mod:`pdf_codec` (q197) and **EXIF** parses/strips via
  :mod:`exif` (q196, the GPS privacy pass).
- **MP3/H.264 stay stubbed** — MDCT/CABAC decoders are out of scope
  for this container: ``decode_image(fake=True)`` keeps the
  deterministic byte-statistics stand-in for pipelines that only need
  the Spark plumbing shape; swapping in ffmpeg later only replaces
  the inner function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media payload column group: content + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # 'image'|'audio'|'video'
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha string, "
    "feat array<double>"
)


def _fake_decode(payload: bytes, n_feat: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: fixed-length features
    derived from byte statistics. Stable across runs and engines."""
    if not payload:
        return [0.0] * n_feat
    acc = [0] * n_feat
    for i, b in enumerate(payload):
        acc[i % n_feat] = (acc[i % n_feat] + b) % 4096
    return [a / 4096.0 for a in acc]


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image codecs not available in this environment; pass fake=True "
        "or swap in a real decoder (Pillow) here"
    )


def extract_features(
    media: DataFrame, fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The Arrow batches stream through Python without materializing the
    whole partition; partitioning is preserved (no shuffle)."""

    # The closure must be SELF-CONTAINED: referencing module-level symbols
    # would make cloudpickle serialize a module reference, and executors of
    # an externally-created session may not have this package on their
    # PYTHONPATH. Locals are pickled by value.
    n_feat = 8

    def _decode(payload: bytes) -> list[float]:
        if not fake:
            raise NotImplementedError(
                "image codecs not available in this environment; pass "
                "fake=True or swap in a real decoder (Pillow) here"
            )
        if not payload:
            return [0.0] * n_feat
        acc = [0] * n_feat
        for i, b in enumerate(payload):
            acc[i % n_feat] = (acc[i % n_feat] + b) % 4096
        return [a / 4096.0 for a in acc]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [_decode(p) for p in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["content"]],
                    "sha": [
                        hashlib.sha256(p or b"").hexdigest()[:16]
                        for p in pdf["content"]
                    ],
                    "feat": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<mime:string,width:int,height:int,duration_ms:bigint,"
    "sample_rate:int>, resized binary, out_width int, out_height int"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_ms bigint, frame binary"
)


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """mapInPandas image resize: payload in → resized payload + updated
    dimensions out, metadata propagated. The decode/encode inner step is
    stubbed (no codecs in this container) with a deterministic
    byte-downsample standing in for a real Pillow resize; the Spark-side
    shape — binary in/out, no shuffle, Arrow batches — is the real
    pipeline."""
    n_out = width * height

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs not available; pass fake=True or swap in "
                    "a real resize (Pillow Image.resize) here"
                )
            out = []
            for p in pdf["content"]:
                p = p or b""
                if len(p) == 0:
                    out.append(b"")
                elif len(p) <= n_out:
                    out.append(bytes(p))
                else:
                    step = len(p) / n_out
                    out.append(bytes(p[int(i * step)] for i in range(n_out)))
            res = pdf.copy()
            res["resized"] = out
            res["out_width"] = width
            res["out_height"] = height
            yield res

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = True
) -> DataFrame:
    """mapInPandas video frame sampling: one output row per sampled frame
    (media fan-out happens INSIDE the Arrow batch, not via explode of a
    pre-built array, so a long video never materializes all frames at
    once). Frame extraction here is stubbed (a deterministic payload
    slice stands in for an ffmpeg seek+decode) — see
    ``sample_frames_real`` below for the REAL seek+decode path over the
    PVM container (q154), which replaces this stub wherever the
    container format is ours to choose."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs not available; pass fake=True or swap in "
                    "a real frame grab (ffmpeg/PyAV) here"
                )
            ids, idxs, mss, frames = [], [], [], []
            for mid, p, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                p = p or b""
                dur = (meta or {}).get("duration_ms") or max(1, len(p))
                n = min(max_frames, max(1, int(dur // every_ms) + 1))
                for j in range(n):
                    ms = j * every_ms
                    if ms > dur:
                        break
                    a = 0 if dur == 0 else int(len(p) * ms / max(dur, 1))
                    ids.append(mid)
                    idxs.append(j)
                    mss.append(ms)
                    frames.append(bytes(p[a : a + 16]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ms": mss,
                    "frame": frames,
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture (text bytes as the
    opaque payload) — exercises the binary-column plumbing end-to-end
    without real codecs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# REAL codec-free decoders (WAV PCM16 / PPM P6) — operators/media_codecs.py
# ---------------------------------------------------------------------------
AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, channels int, duration_ms long, "
    "rms double, peak double, zcr double, decode_err string"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, luma_mean double, luma_std double, decode_err string"
)


def extract_wav_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction for RIFF/PCM16 payloads: duration,
    full-scale RMS, peak, zero-crossing rate (media_codecs.wav_features
    — pure struct+numpy, no external codec). Arrow-batched mapInPandas,
    no shuffle. The closure imports the codec module lazily on the
    executor — harden_session ships the package via addPyFile, so this
    resolves under externally-created sessions too."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from django_datastream_spark.operators.media_codecs import wav_features

        nulls = {
            "sample_rate": None, "channels": None, "duration_ms": None,
            "rms": None, "peak": None, "zcr": None,
        }
        for pdf in batches:
            rows = []
            for p in pdf["content"]:
                # per-row quarantine: one corrupt payload must not kill
                # the task (and with it the whole 100 TB job) — emit a
                # null row with the reason instead, mirroring the
                # PERMISSIVE corrupt-record policy of sources/files.py
                try:
                    rows.append({**wav_features(p or b""), "decode_err": None})
                except Exception as e:  # noqa: BLE001 — quarantine, not mask
                    rows.append({**nulls, "decode_err": str(e)[:200]})
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def extract_flac_features(media: DataFrame) -> DataFrame:
    """REAL compressed-audio feature extraction: the from-spec FLAC
    decoder (operators/flac_codec — Rice partitions, FIXED/LPC
    prediction, stereo decorrelation, CRC-8/16 + PCM-MD5 verification)
    feeding the same signal-feature contract as
    :func:`extract_wav_features`. Arrow-batched mapInPandas, no
    shuffle; corrupt payloads quarantine as decode_err rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from django_datastream_spark.operators.flac_codec import (
            flac_features,
        )

        nulls = {
            "sample_rate": None, "channels": None, "duration_ms": None,
            "rms": None, "peak": None, "zcr": None,
        }
        for pdf in batches:
            rows = []
            for p in pdf["content"]:
                try:
                    rows.append(
                        {**flac_features(p or b""), "decode_err": None}
                    )
                except Exception as e:  # noqa: BLE001 — quarantine
                    rows.append({**nulls, "decode_err": str(e)[:200]})
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def extract_image_features(media: DataFrame, fmt: str) -> DataFrame:
    """REAL image feature extraction, one Arrow-batched implementation
    for every decodable format — ``fmt`` in {"ppm", "png", "jpeg",
    "gif", "bmp", "tiff"} picks the decoder inside the executor closure (each is a
    genuine from-the-spec implementation in media_codecs/jpeg_codec).
    All formats share the feature contract (dims, channel means, BT.601
    luma mean/std; grayscale replicates); corrupt payloads quarantine
    as decode_err rows, never task failures. Map-only: one batch pass,
    no shuffle."""
    if fmt not in ("ppm", "png", "jpeg", "gif", "bmp", "tiff"):
        raise ValueError(f"unsupported format {fmt!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from django_datastream_spark.operators import media_codecs as mc

        if fmt == "jpeg":
            from django_datastream_spark.operators.jpeg_codec import (
                parse_jpeg as decode,
            )
        else:
            decode = {
                "ppm": mc.parse_ppm,
                "png": mc.parse_png,
                "gif": mc.parse_gif,
                "bmp": mc.parse_bmp,
                "tiff": mc.parse_tiff,
            }[fmt]
        nulls = {
            "width": None, "height": None, "mean_r": None, "mean_g": None,
            "mean_b": None, "luma_mean": None, "luma_std": None,
        }
        for pdf in batches:
            rows = []
            for p in pdf["content"]:
                try:
                    feats = mc.image_features_from_array(
                        decode(bytes(p or b""))
                    )
                    rows.append({**feats, "decode_err": None})
                except Exception as e:  # noqa: BLE001 — quarantine
                    rows.append({**nulls, "decode_err": str(e)[:200]})
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def extract_png_features(media: DataFrame) -> DataFrame:
    """PNG decode through the shared extractor (CRC-checked chunk walk,
    zlib inflate, scanline unfilter — q158's oracle pins it)."""
    return extract_image_features(media, "png")


def extract_gif_features(media: DataFrame) -> DataFrame:
    """GIF87a decode through the shared extractor (real variable-width
    LZW — q169's lossless closed-form oracle pins it)."""
    return extract_image_features(media, "gif")


def extract_bmp_features(media: DataFrame) -> DataFrame:
    """BMP decode through the shared extractor (24-bit + paletted
    RLE8 — q194's lossless palette oracle pins it)."""
    return extract_image_features(media, "bmp")


def extract_tiff_features(media: DataFrame) -> DataFrame:
    """TIFF decode through the shared extractor (strips, PackBits +
    early-change LZW — q201's lossless oracle pins it)."""
    return extract_image_features(media, "tiff")


def extract_jpeg_features(media: DataFrame) -> DataFrame:
    """Baseline-JPEG decode through the shared extractor (Huffman ->
    dequant -> IDCT — q168's planted-coefficient oracle pins it)."""
    return extract_image_features(media, "jpeg")


def transcode_png_to_ppm(media: DataFrame) -> DataFrame:
    """Transcode PNG payloads to P6 PPM (real inflate+unfilter decode,
    real re-encode; alpha dropped, gray replicated) so PNG inputs flow
    into every existing PPM operator — resize, dHash near-dup, video
    frame pipelines — without those operators growing format branches.
    Binary in/out, Arrow-batched, partitioning preserved."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from django_datastream_spark.operators.media_codecs import png_to_ppm

        for pdf in batches:
            contents, errs = [], []
            for p in pdf["content"]:
                try:
                    contents.append(png_to_ppm(p or b""))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — quarantine
                    contents.append(None)
                    errs.append(str(e)[:200])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": contents,
                    "decode_err": errs,
                }
            )

    return media.mapInPandas(
        run, "media_id long, content binary, decode_err string"
    )


def extract_ppm_features(media: DataFrame) -> DataFrame:
    """P6 PPM decode through the shared extractor."""
    return extract_image_features(media, "ppm")


def resize_ppm_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for P6 PPM payloads (index-map
    sampling, re-encoded P6) — the codec-free counterpart of
    resize_images' stub. Same Spark shape: binary in/out, Arrow
    batches, partitioning preserved."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from django_datastream_spark.operators.media_codecs import resize_ppm

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "resized": [
                        resize_ppm(p or b"", width, height)
                        for p in pdf["content"]
                    ],
                    "out_width": width,
                    "out_height": height,
                }
            )

    return media.mapInPandas(
        run, "media_id long, resized binary, out_width int, out_height int"
    )


def image_dhash_chunks(media: DataFrame) -> DataFrame:
    """Perceptual-hash fingerprints over the REAL decode path: parse
    each P6 payload (media_codecs.parse_ppm), compute the 9x8 dHash,
    and emit it as four (media_id, k, v) 16-bit chunk rows — the
    banded form the near-dup pair join consumes directly (same
    pigeonhole layout as simhash_near_pairs in operators/dedup.py).
    Corrupt payloads are quarantined as k = -1 rows carrying
    decode_err, never a task failure.  Map-only: one Arrow batch pass,
    no shuffle until the caller's candidate join."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from django_datastream_spark.operators.media_codecs import (
            ppm_dhash_chunks,
        )

        for pdf in batches:
            ids, ks, vs, errs = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["content"]):
                try:
                    for k, v in enumerate(ppm_dhash_chunks(p or b"")):
                        ids.append(mid)
                        ks.append(k)
                        vs.append(v)
                        errs.append(None)
                except Exception as e:  # noqa: BLE001 — quarantine
                    ids.append(mid)
                    ks.append(-1)
                    vs.append(None)
                    errs.append(str(e)[:200])
            yield pd.DataFrame(
                {"media_id": ids, "k": ks, "v": vs, "decode_err": errs}
            )

    return media.mapInPandas(
        run, "media_id long, k int, v long, decode_err string"
    )


def dhash_near_pairs(chunks: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate image pairs from dHash chunk rows:
    candidates are ids agreeing on >= 1 of the 4 chunks (pigeonhole:
    Hamming distance <= 3 over 64 bits guarantees an exact 16-bit
    chunk match), then the exact distance Σ bit_count(va XOR vb)
    filters candidates.  The candidate join is a plain equi-join on
    (k, v) — bucket sizes track near-dup cluster sizes, never the
    corpus — and the verify join touches only candidate ids."""
    if max_hamming > 3:
        # ValueError, not assert: python -O strips asserts, and a
        # skipped check here silently MISSES pairs beyond the
        # pigeonhole guarantee
        raise ValueError("4-chunk pigeonhole only covers distance <= 3")
    c = chunks.filter(F.col("k") >= 0).select("media_id", "k", "v")
    a, b = c.alias("a"), c.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("ia"),
            F.col("b.media_id").alias("ib"),
        )
        .distinct()
    )
    ca = c.select(
        F.col("media_id").alias("ia"), "k", F.col("v").alias("va")
    )
    cb = c.select(
        F.col("media_id").alias("ib"), "k", F.col("v").alias("vb")
    )
    return (
        cand.join(ca, "ia")
        .join(cb, ["ib", "k"])
        .groupBy("ia", "ib")
        .agg(
            F.sum(
                F.bit_count(
                    F.col("va").bitwiseXOR(F.col("vb"))
                )
            ).cast("long").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("ia").alias("a"), F.col("ib").alias("b"), "hamming"
        )
    )


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_ms long, width int, height int, "
    "luma_mean double, decode_err string"
)


def sample_frames_real(
    media: DataFrame, every_ms: int = 500, max_frames: int = 8
) -> DataFrame:
    """REAL video frame sampling over the PVM container
    (media_codecs.encode_pvm / pvm_frame): the index scan touches only
    header + length prefixes, each sampled timestamp seeks directly to
    its frame and runs the real PPM decode + luma feature — unsampled
    frames are never decoded, which is the property that makes
    timestamp sampling over hour-long videos linear in SAMPLES, not in
    frames.  Fan-out happens inside the Arrow batch (one output row
    per sampled frame); corrupt payloads quarantine per-row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from django_datastream_spark.operators.media_codecs import (
            bt601_luma,
            parse_pvm_index,
            pvm_frame,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "frame_ms", "width",
                "height", "luma_mean", "decode_err",
            )}

            def emit(mid, fi, ms, w, h, lm, err):
                out["media_id"].append(mid)
                out["frame_idx"].append(fi)
                out["frame_ms"].append(ms)
                out["width"].append(w)
                out["height"].append(h)
                out["luma_mean"].append(lm)
                out["decode_err"].append(err)

            for mid, p in zip(pdf["media_id"], pdf["content"]):
                try:
                    index = parse_pvm_index(p or b"")
                    n, fps, _ = index
                    dur_ms = n * 1000 // fps
                    for j in range(max_frames):
                        ms = j * every_ms
                        k = ms * fps // 1000
                        if ms >= dur_ms or k >= n:
                            break
                        a = pvm_frame(p, k, index=index).astype(
                            np.float64
                        )
                        luma = bt601_luma(a)
                        emit(
                            mid, k, ms, a.shape[1], a.shape[0],
                            float(luma.mean()), None,
                        )
                except Exception as e:  # noqa: BLE001 — quarantine
                    emit(mid, -1, -1, None, None, None, str(e)[:200])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, VIDEO_FRAME_SCHEMA)
