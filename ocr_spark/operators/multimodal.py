"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as BinaryType columns; decode/resize/
frame-sample run as Arrow-batched ``mapInPandas`` stages.

- ``media_metadata``   — size, sha256, magic-byte sniffing, plus a
  deterministic fake decode (dims derived from the digest) whose arithmetic
  is SQL-expressible, so the driver can oracle-check the UDF plumbing
  end-to-end.
- ``decode_image`` / ``resize_images`` / ``image_features`` — REAL decode
  via the pure-stdlib codec (ocr_spark.imagecodec: PNG/PPM/BMP), with a
  PIL fallback for formats it can't cover (JPEG — the one remaining
  environment-blocked codec).  decode → resize → features → ANN runs
  end-to-end in this container; mm_decode_stats / mm_resize_stats /
  mm_image_features oracle-check the decoded pixels analytically.
- ``decode_audio_stats`` / ``resample_audio`` / ``audio_features`` — REAL
  decode via the pure-stdlib WAV codec (ocr_spark.audiocodec: RIFF PCM
  8/16-bit).  decode → resample → band features → ANN runs end-to-end in
  this container; mm_audio_stats / mm_audio_resample / mm_audio_features
  oracle-check the decoded samples analytically (MP3/AAC stay
  environment-blocked).
- ``decode_gif_frames`` / ``gif_frame_features`` — REAL frame decode via
  the pure-stdlib GIF codec (ocr_spark.gifcodec: LZW, interlace,
  transparency, disposal compositing): sampled composited frames →
  per-frame grid features → ANN runs end-to-end in this container;
  mm_gif_frames oracle-checks the composited pixels analytically.
- ``sample_frames``    — REAL plumbing over the fake decode: deterministic
  frame-index sampling, one output row per sampled frame (true video
  codecs — webm/mp4 — stay environment-blocked).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import audiocodec, imagecodec

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
    ]
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
]

# RIFF is a container, not a format: the fourcc at bytes 8:12 decides —
# a bare 'RIFF' prefix used to classify WEBP images and AVI video as
# audio/wav, corrupting any corpus census keyed on kind
_RIFF_KINDS = {b"WAVE": "audio/wav", b"WEBP": "image/webp",
               b"AVI ": "video/avi"}


def _sniff(payload: bytes) -> str:
    if payload.startswith(b"RIFF"):
        return _RIFF_KINDS.get(
            payload[8:12], "application/octet-stream"
        )
    for magic, kind in _MAGIC:
        if payload.startswith(magic):
            return kind
    return "application/octet-stream"


def _req_bytes(payload, what: str) -> bytes:
    """NULL payloads are routine in crawl data; bytes(None) is an opaque
    TypeError deep in the Arrow batch — raise the typed domain error
    every other corrupt payload gets instead."""
    if payload is None:
        raise ValueError(f"NULL {what} payload")
    return bytes(payload)


def fake_decode_dims(sha_hex: str) -> tuple[int, int, int]:
    """Deterministic 'decode': dims from the digest prefix.  SQL twin:
    width  = hexint(substr(sha,1,8))  % 1920 + 1
    height = hexint(substr(sha,9,8))  % 1080 + 1
    frames = hexint(substr(sha,17,4)) % 240  + 1
    """
    return (
        int(sha_hex[0:8], 16) % 1920 + 1,
        int(sha_hex[8:16], 16) % 1080 + 1,
        int(sha_hex[16:20], 16) % 240 + 1,
    )


def media_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in MEDIA_META_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                sha = hashlib.sha256(data).hexdigest()
                w, h, nf = fake_decode_dims(sha)
                out["media_id"].append(int(mid))
                out["n_bytes"].append(len(data))
                out["sha"].append(sha)
                out["kind"].append(_sniff(data))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
            yield pd.DataFrame(out)

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, MEDIA_META_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Binary payload → dense feature vector (``array<float>``).

    The embedding model itself is stubbed deterministically (sha256 bytes
    scaled to [0,1] — SQL twin: hex-pair decode / 255), but the Spark-side
    plumbing is the real thing: Arrow-batched binary in, fixed-dim float
    vector column out, ready for the similarity operators
    (cosine_topk_bruteforce / lsh_topk / ivf_topk) downstream."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(data).digest()
                ids.append(int(mid))
                feats.append(
                    [digest[i] / 255.0 for i in range(FEATURE_DIM)]
                )
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, FEATURES_SCHEMA)


def decode_image(payload: bytes) -> imagecodec.DecodedImage:
    """REAL decode: PNG / PPM / BMP via the pure-stdlib codec
    (ocr_spark.imagecodec — zlib inflate + all five PNG filters), PIL
    fallback for formats the stdlib codec can't cover (JPEG).  Raises
    NotImplementedError only for a format neither path handles — loudly,
    never a wrong silent decode.

    Corrupt-but-sniffed payloads (truncated IDAT zlib stream, cut chunk
    header — routine in interrupted crawls) raise ``zlib.error`` /
    ``struct.error`` / ``IndexError`` from inside the codec, not
    ValueError; they get the same fallback-then-loud-failure treatment
    instead of escaping as an opaque executor traceback."""
    import struct
    import zlib

    if payload is None:
        # bytes(None) is an opaque TypeError deep in the Arrow batch;
        # NULL payloads are routine in crawl data and deserve the typed
        # domain error every other corrupt payload gets
        raise ValueError("NULL image payload")
    try:
        return imagecodec.sniff_decode(bytes(payload))
    except (ValueError, zlib.error, struct.error, IndexError) as codec_err:
        try:
            import io

            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                f"stdlib codec: {codec_err}; PIL fallback not installed"
            ) from codec_err
        try:
            img = Image.open(io.BytesIO(payload))
            # re-apply the decode cap from the (lazily parsed) header
            # BEFORE .convert() decodes pixels — otherwise a PNG bomb the
            # stdlib codec correctly rejected would sail through PIL up
            # to its own much larger pixel limit
            if img.width * img.height * 3 > imagecodec.MAX_DECODED_BYTES:
                raise ValueError(
                    f"{img.width}x{img.height} exceeds the "
                    f"{imagecodec.MAX_DECODED_BYTES}-byte decode cap "
                    f"(PIL fallback)"
                )
            img = img.convert("RGB")
        except ValueError:
            raise
        except OSError as pil_err:
            # UnidentifiedImageError / truncated-file OSError — wrap into
            # the documented loud failure instead of an opaque traceback
            raise ValueError(
                f"stdlib codec: {codec_err}; PIL fallback: {pil_err}"
            ) from codec_err
        return imagecodec.DecodedImage(
            img.width, img.height, 3, img.tobytes()
        )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize: decode (stdlib codec / PIL fallback), nearest-neighbor
    resample (exact integer index mapping — SQL-replayable), re-encode as
    PNG."""
    out = imagecodec.resize_nearest(decode_image(payload), width, height)
    return imagecodec.png_encode(out.width, out.height, out.pixels, 3)


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
    ]
)


def decode_image_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode each image payload and emit exact per-channel pixel sums —
    integer stats every pixel participates in, so a single wrong filter
    inverse / row order / channel swap changes the output (the
    mm_decode_stats oracle recomputes them analytically in SQL)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in DECODE_STATS_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                img = imagecodec.to_rgb(decode_image(payload))
                px = img.pixels
                out["media_id"].append(int(mid))
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["n_channels"].append(img.channels)
                out["sum_r"].append(sum(px[0::3]))
                out["sum_g"].append(sum(px[1::3]))
                out["sum_b"].append(sum(px[2::3]))
            yield pd.DataFrame(out)

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, DECODE_STATS_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Binary in → resized PNG binary out (decode → nearest-neighbor →
    re-encode), the standard image-normalization stage of a multimodal
    training pipeline.  Payloads cross the Arrow boundary once in and
    once out; chain :func:`decode_image_stats` / :func:`image_features`
    AFTER this stage rather than re-reading originals."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                ids.append(int(mid))
                payloads.append(resize_image(_req_bytes(payload, "image"), width, height))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, RESIZED_SCHEMA)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def image_features(
    df: DataFrame,
    grid: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode → ``grid×grid`` mean-pooled intensity vector
    (``array<double>``, row-major, length grid²) — a real decoded-pixel
    embedding ready for the ANN operators (cosine_topk_bruteforce /
    lsh_topk / ivf_topk) downstream.

    Cell (cy, cx) covers y ∈ [cy·H//grid, (cy+1)·H//grid) × x likewise
    (exact integer boundaries); its feature is
    sum(r+g+b over the cell) / (3·n_cell_pixels) — one IEEE division of
    exact integers, so values are bit-deterministic across partitionings
    and engines (no transcendentals; the round(·,9) policy does not
    apply)."""
    if grid <= 0:
        raise ValueError("grid must be positive")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                img = imagecodec.to_rgb(decode_image(payload))
                if img.width < grid or img.height < grid:
                    raise ValueError(
                        f"image {int(mid)} is {img.width}x{img.height}; "
                        f"needs >= {grid}px per side for a {grid}x{grid} grid"
                    )
                arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(
                    img.height, img.width, 3
                )
                vec = []
                for cy in range(grid):
                    y0, y1 = (
                        cy * img.height // grid,
                        (cy + 1) * img.height // grid,
                    )
                    for cx in range(grid):
                        x0, x1 = (
                            cx * img.width // grid,
                            (cx + 1) * img.width // grid,
                        )
                        cell = arr[y0:y1, x0:x1]
                        # exact integer sum, ONE double division
                        vec.append(
                            int(cell.sum(dtype=np.int64))
                            / float(3 * cell.shape[0] * cell.shape[1])
                        )
                ids.append(int(mid))
                feats.append(vec)
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


def synthetic_image_bytes(
    seed: int, width: int = 24, height: int = 16, fmt: str = "png"
) -> bytes:
    """Deterministic test-fixture image: pixel (x, y) is
    r=(3x+7y+seed)%256, g=(5x+11y+2·seed)%251, b=(13x+17y+3·seed)%241 —
    closed-form values a SQL oracle recomputes analytically (seed must be
    non-negative so ``%`` agrees across Python/Spark/DuckDB).  PNG output
    cycles the filter type per row, so decoding it exercises all five
    PNG filters."""
    if seed < 0:
        raise ValueError("seed must be non-negative (cross-engine %)")
    px = bytearray(width * height * 3)
    for y in range(height):
        for x in range(width):
            i = (y * width + x) * 3
            px[i] = (3 * x + 7 * y + seed) % 256
            px[i + 1] = (5 * x + 11 * y + 2 * seed) % 251
            px[i + 2] = (13 * x + 17 * y + 3 * seed) % 241
    if fmt == "png":
        return imagecodec.png_encode(width, height, bytes(px), 3, "cycle")
    if fmt == "ppm":
        return imagecodec.ppm_encode(width, height, bytes(px))
    if fmt == "bmp":
        return imagecodec.bmp_encode(width, height, bytes(px))
    raise ValueError(f"unknown fixture format {fmt!r}")


def synthetic_images(
    df: DataFrame,
    width: int = 24,
    height: int = 16,
    fmt: str = "png",
    id_col: str = "media_id",
) -> DataFrame:
    """(id) → (media_id, payload) of :func:`synthetic_image_bytes` —
    a distributed deterministic image source for tests/contracts (no
    image libraries exist in this container to produce real corpora)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(m) for m in pdf["media_id"]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        synthetic_image_bytes(m, width, height, fmt)
                        for m in ids
                    ],
                }
            )

    return df.select(df[id_col].alias("media_id")).mapInPandas(
        fn, RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_i", T.IntegerType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    every: int = 30,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """One row per sampled frame index (0, every, 2·every, …) — the
    fan-out shape of video-frame extraction; frame content is the
    deterministic digest of (payload, index) until a real codec exists."""
    if every < 1:
        # fail on the driver, not as an opaque range() error in the UDF
        raise ValueError(f"every must be >= 1, got {every}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fis, shas = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                sha = hashlib.sha256(data).hexdigest()
                _, _, nf = fake_decode_dims(sha)
                for fi in range(0, nf, every):
                    ids.append(int(mid))
                    fis.append(fi)
                    shas.append(
                        hashlib.sha256(data + fi.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_i": fis, "frame_sha": shas}
            )

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# audio branch — REAL decode via the pure-stdlib WAV codec
# (ocr_spark.audiocodec), the audio twin of decode_image_stats /
# resize_images / image_features: decode → resample → band features → ANN
# runs end-to-end in this container.  MP3/AAC stay environment-blocked;
# a production cluster swaps a vectorized decoder into the same
# mapInPandas seam (the plumbing — schema, Arrow batching, partitioning —
# is identical either way).

AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("duration_ms", T.IntegerType(), False),
        T.StructField("sum_abs", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def decode_audio_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode each WAV payload and emit exact integer sample stats —
    every sample participates in ``sum_abs``, so a wrong channel
    interleave, sign convention, or chunk walk changes the output (the
    mm_audio_stats oracle recomputes them analytically in SQL).
    ``duration_ms = n_frames * 1000 // rate`` stays integer-exact."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_STATS_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                au = audiocodec.wav_decode(_req_bytes(payload, "audio"))
                out["media_id"].append(int(mid))
                out["sample_rate"].append(au.sample_rate)
                out["n_channels"].append(au.n_channels)
                out["n_frames"].append(au.n_frames)
                out["duration_ms"].append(
                    au.n_frames * 1000 // au.sample_rate
                )
                out["sum_abs"].append(sum(abs(v) for v in au.samples))
                out["peak"].append(
                    max((abs(v) for v in au.samples), default=0)
                )
            yield pd.DataFrame(out)

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, AUDIO_STATS_SCHEMA)


def resample_audio(
    df: DataFrame,
    out_rate: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """WAV in → rate-converted WAV out (decode → nearest-frame resample →
    re-encode), the audio-normalization stage of a multimodal training
    pipeline.  The index map is exact integer arithmetic
    (``src = j * in_rate // out_rate``), so mm_audio_resample replays two
    full codec round trips plus the mapping in SQL."""
    if out_rate < 1:
        # fail on the driver, not as an opaque error inside the UDF
        raise ValueError(f"out_rate must be >= 1, got {out_rate}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                au = audiocodec.resample_nearest(
                    audiocodec.wav_decode(_req_bytes(payload, "audio")), out_rate
                )
                ids.append(int(mid))
                payloads.append(
                    audiocodec.wav_encode(
                        au.samples, au.sample_rate, au.n_channels,
                        au.sample_width,
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def audio_features(
    df: DataFrame,
    n_bands: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode → per-band mean |amplitude| vector (``array<double>``,
    length ``n_bands``) — a real decoded-sample embedding ready for the
    ANN operators downstream, the audio twin of :func:`image_features`.

    Band b covers frames [b·F//n_bands, (b+1)·F//n_bands) (exact integer
    boundaries); its feature is sum(|s| over the band, all channels) /
    (n_channels · band_frames) — one IEEE division of exact integers, so
    values are bit-deterministic across partitionings and engines (no
    transcendentals; the round(·,9) policy does not apply)."""
    if n_bands <= 0:
        raise ValueError("n_bands must be positive")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                au = audiocodec.wav_decode(_req_bytes(payload, "audio"))
                nf, ch = au.n_frames, au.n_channels
                if nf < n_bands:
                    raise ValueError(
                        f"audio {int(mid)} has {nf} frames; needs >= "
                        f"{n_bands} for {n_bands} bands"
                    )
                vec = []
                for b in range(n_bands):
                    f0 = b * nf // n_bands
                    f1 = (b + 1) * nf // n_bands
                    s = sum(
                        abs(v) for v in au.samples[f0 * ch : f1 * ch]
                    )
                    vec.append(s / float(ch * (f1 - f0)))
                ids.append(int(mid))
                feats.append(vec)
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def synthetic_wav_bytes(
    seed: int,
    n_frames: int = 480,
    sample_rate: int = 8000,
    n_channels: int = 2,
    sample_width: int = 2,
) -> bytes:
    """Deterministic test-fixture audio: channel c of frame i holds
    sample ((7·i + 13·c + seed) % 4001) − 2000 — closed-form values a
    SQL oracle recomputes analytically (seed must be non-negative so
    ``%`` agrees across Python/Spark/DuckDB).  The range tiles the
    signed-16-bit domain's center, exercising both signs."""
    if seed < 0:
        raise ValueError("seed must be non-negative (cross-engine %)")
    samples = [
        (7 * i + 13 * c + seed) % 4001 - 2000
        for i in range(n_frames)
        for c in range(n_channels)
    ]
    return audiocodec.wav_encode(
        samples, sample_rate, n_channels, sample_width
    )


def synthetic_audio(
    df: DataFrame,
    n_frames: int = 480,
    sample_rate: int = 8000,
    n_channels: int = 2,
    id_col: str = "media_id",
) -> DataFrame:
    """(id) → (media_id, payload) of :func:`synthetic_wav_bytes` — a
    distributed deterministic audio source for tests/contracts (no audio
    libraries exist in this container to produce real corpora)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(m) for m in pdf["media_id"]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        synthetic_wav_bytes(
                            m, n_frames, sample_rate, n_channels
                        )
                        for m in ids
                    ],
                }
            )

    return df.select(df[id_col].alias("media_id")).mapInPandas(
        fn, RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# animation / frame branch — REAL decode via the pure-stdlib GIF codec
# (ocr_spark.gifcodec): LZW + compositing make frame sampling runnable
# on the web's native animation format (sample_frames keeps the
# digest-fake path for the containers that stay environment-blocked —
# webm/mp4 need real video codecs).

GIF_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_i", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
    ]
)


def decode_gif_frames(
    df: DataFrame,
    every: int = 1,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """GIF payloads → one row per SAMPLED composited frame (indices 0,
    ``every``, 2·``every``, …) with exact per-channel pixel sums — the
    runnable twin of :func:`sample_frames`: every canvas pixel of every
    sampled frame participates, so a wrong LZW reset, interlace pass,
    transparency skip, or disposal rect changes the output (the
    mm_gif_frames oracle recomputes the sums analytically)."""
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import gifcodec

        for pdf in batches:
            out = {k.name: [] for k in GIF_FRAME_STATS_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                dec = gifcodec.gif_decode(_req_bytes(payload, "gif"))
                for fi in range(0, len(dec.frames), every):
                    px = dec.frames[fi]
                    out["media_id"].append(int(mid))
                    out["frame_i"].append(fi)
                    out["width"].append(dec.width)
                    out["height"].append(dec.height)
                    out["n_frames"].append(len(dec.frames))
                    out["sum_r"].append(sum(px[0::3]))
                    out["sum_g"].append(sum(px[1::3]))
                    out["sum_b"].append(sum(px[2::3]))
            yield pd.DataFrame(out)

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, GIF_FRAME_STATS_SCHEMA)


GIF_FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_i", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def gif_frame_features(
    df: DataFrame,
    every: int = 1,
    grid: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Sampled GIF frames → ``grid×grid`` mean-pooled intensity vectors
    (one ``array<double>`` per frame, the :func:`image_features` cell
    map applied per frame) — ANN-ready per-frame embeddings, the shape a
    video-similarity pipeline fans out to.  Exact integer sums + one
    IEEE division per cell: bit-deterministic across partitionings and
    engines."""
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    if grid <= 0:
        raise ValueError("grid must be positive")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .. import gifcodec

        for pdf in batches:
            ids, fis, feats = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                dec = gifcodec.gif_decode(_req_bytes(payload, "gif"))
                if dec.width < grid or dec.height < grid:
                    raise ValueError(
                        f"gif {int(mid)} canvas {dec.width}x{dec.height} "
                        f"needs >= {grid}px per side for a {grid}x{grid} grid"
                    )
                for fi in range(0, len(dec.frames), every):
                    arr = np.frombuffer(
                        dec.frames[fi], dtype=np.uint8
                    ).reshape(dec.height, dec.width, 3)
                    vec = []
                    for cy in range(grid):
                        y0 = cy * dec.height // grid
                        y1 = (cy + 1) * dec.height // grid
                        for cx in range(grid):
                            x0 = cx * dec.width // grid
                            x1 = (cx + 1) * dec.width // grid
                            cell = arr[y0:y1, x0:x1]
                            vec.append(
                                int(cell.sum(dtype=np.int64))
                                / float(3 * cell.shape[0] * cell.shape[1])
                            )
                    ids.append(int(mid))
                    fis.append(fi)
                    feats.append(vec)
            yield pd.DataFrame(
                {"media_id": ids, "frame_i": fis, "features": feats}
            )

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, GIF_FRAME_FEATURES_SCHEMA)


def synthetic_gif_bytes(
    seed: int, width: int = 24, height: int = 16, n_frames: int = 6
) -> bytes:
    """Deterministic animated-GIF fixture: the global palette holds
    entry i = ((7i) % 256, (11i + 3) % 256, (13i + 5) % 256) and frame f
    paints pixel (x, y) with index (x + 2y + 5f + seed) % 256 — both
    closed-form, so a SQL oracle recomputes composited-frame channel
    sums analytically (seed must be non-negative for cross-engine %).
    Full-canvas frames; the literal LZW writer re-CLEARs mid-stream, so
    decoding exercises the reset path on every frame."""
    if seed < 0:
        raise ValueError("seed must be non-negative (cross-engine %)")
    from .. import gifcodec

    palette = b"".join(
        bytes(((7 * i) % 256, (11 * i + 3) % 256, (13 * i + 5) % 256))
        for i in range(256)
    )
    frames = [
        bytes(
            (x + 2 * y + 5 * f + seed) % 256
            for y in range(height)
            for x in range(width)
        )
        for f in range(n_frames)
    ]
    return gifcodec.gif_encode(width, height, frames, palette)


def synthetic_gifs(
    df: DataFrame,
    width: int = 24,
    height: int = 16,
    n_frames: int = 6,
    id_col: str = "media_id",
) -> DataFrame:
    """(id) → (media_id, payload) of :func:`synthetic_gif_bytes` — a
    distributed deterministic animation source for tests/contracts."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(m) for m in pdf["media_id"]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        synthetic_gif_bytes(m, width, height, n_frames)
                        for m in ids
                    ],
                }
            )

    return df.select(df[id_col].alias("media_id")).mapInPandas(
        fn, RESIZED_SCHEMA
    )


def _ahash_schema(grid: int) -> T.StructType:
    """The ahash column's metadata records the grid it was built with —
    the shared-frame param guard (CLAUDE.md: simhash sig= precedent).  A
    grid-4 frame banded as 64 bits would give every image key 0 in the
    five high bands: a silent full-corpus bucket, quadratic at scale."""
    return T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField(
                "ahash", T.LongType(), False, {"ahash_grid": grid}
            ),
            T.StructField("intensity_sum", T.LongType(), False),
        ]
    )


def image_ahash(
    df: DataFrame,
    grid: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Perceptual average-hash per image: decode → nearest-neighbor
    resize to ``grid×grid`` (the canonical aHash normalization — scale
    and format invariant by construction) → bit i set iff cell i's
    intensity exceeds the image mean → pack row-major into a signed
    bigint.  ``(media_id, ahash, intensity_sum)``; re-encodes of the
    same picture, resizes, and format conversions land within a few
    bits, which is what :func:`image_near_dup_pairs` thresholds on.

    Exactness: intensity is the integer r+g+b of the resized pixel, and
    the mean comparison is CROSS-MULTIPLIED (``v·grid² > total``) so no
    float exists anywhere — the hash is bit-deterministic across
    partitionings and analytically reproducible in SQL (the oracle
    twin).  Ties (``v·grid² == total``) are 0 bits.  Bit ``grid²-1`` of
    an 8×8 hash is the bigint sign bit; downstream banding masks after
    its arithmetic shifts, and XOR/bit_count are sign-agnostic, so the
    full 64-bit domain is safe (unlike the bloom positions, nothing
    here re-shifts an unmasked value).

    The whole operator is ONE Arrow-batched ``mapInPandas`` pass (the
    decode is necessarily Python; the hash costs nothing more on top),
    no shuffle, no driver state — at corpus scale each executor streams
    its images once."""
    if grid < 2 or grid * grid > 64:
        raise ValueError(
            f"grid must be in [2, 8] (grid² bits must fit a bigint), "
            f"got {grid}"
        )
    n = grid * grid

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, sums = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                img = imagecodec.resize_nearest(
                    decode_image(_req_bytes(payload, "image")), grid, grid
                )
                vals = [
                    img.pixels[3 * i]
                    + img.pixels[3 * i + 1]
                    + img.pixels[3 * i + 2]
                    for i in range(n)
                ]
                total = sum(vals)
                h = 0
                for i, v in enumerate(vals):
                    if v * n > total:
                        h |= 1 << i
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(int(mid))
                hashes.append(h)
                sums.append(total)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "ahash": pd.array(hashes, dtype="int64"),
                    "intensity_sum": pd.array(sums, dtype="int64"),
                }
            )

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, _ahash_schema(grid))


def image_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    grid: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_bucket: int | None = None,
    ahash: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance —
    ``(media_a, media_b, hamming)`` with ``hamming <= max_hamming``:
    the image twin of text simhash dedup (re-encoded thumbnails, format
    conversions, light recompression collapse to the same aHash
    neighborhood).

    Plan shape: one decode pass (:func:`image_ahash`) → the generic
    exact-recall pigeonhole band join
    (:func:`ocr_spark.operators.dedup.hamming_near_dup_pairs`) carrying
    8-byte signatures only — image payloads never enter any join.  The
    ``max_bucket`` cap is OPT-IN with the standard audit
    (``dedup.hamming_hot_buckets`` over the same ``ahash`` frame — pass
    a persisted one via ``ahash=`` to share the decode, caller owns the
    lifecycle)."""
    from .dedup import hamming_near_dup_pairs

    sig = (
        image_ahash(df, grid, payload_col, id_col)
        if ahash is None
        else ahash
    )
    if "ahash" not in sig.columns:
        raise ValueError(
            "ahash frame lacks an 'ahash' column — build it with "
            "image_ahash(df, ...)"
        )
    got = (sig.schema["ahash"].metadata or {}).get("ahash_grid")
    if got is not None and int(got) != grid:
        raise ValueError(
            f"ahash frame was built with grid={got}; this call passed "
            f"grid={grid} — banding the wrong bit width makes the high "
            f"bands a single full-corpus bucket (silently quadratic)"
        )
    pairs = hamming_near_dup_pairs(
        sig.select(
            F.col("media_id"), F.col("ahash").alias("simhash")
        ),
        bits=grid * grid,
        max_hamming=max_hamming,
        id_col="media_id",
        max_bucket=max_bucket,
    )
    return pairs.select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


def _fp_schema(n_bits: int) -> T.StructType:
    """fingerprint is NULLABLE: a clip shorter than n_bits+1 frames is
    decodable data, not corruption — it gets a NULL fingerprint (never
    pairs) instead of killing the whole corpus job, the random_project
    try_element_at posture.  Metadata records n_bits for the
    shared-frame guard."""
    return T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField(
                "fingerprint", T.LongType(), True, {"fp_bits": n_bits}
            ),
            T.StructField("energy_sum", T.LongType(), False),
        ]
    )


def audio_fingerprint(
    df: DataFrame,
    n_bits: int = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Acoustic fingerprint per clip (Haitsma-Kalker / Chromaprint
    family, time-energy variant): decode → ``n_bits + 1`` time windows
    of summed |amplitude| → bit i set iff window i+1 carries more energy
    per frame than window i → pack into a signed bigint.
    ``(media_id, fingerprint, energy_sum)``; re-encodes, resamples, and
    small amplitude scalings preserve the energy-DELTA signs, which is
    what :func:`audio_near_dup_pairs` thresholds on.

    Exactness: window sums are exact integers (PCM samples), and the
    per-frame comparison is CROSS-MULTIPLIED
    (``s[i+1]·len(i) > s[i]·len(i+1)``) so no float exists anywhere —
    bit-deterministic and analytically reproducible in SQL.  Window
    boundaries are the shared exact-integer convention
    (``f0(b) = b·F//W``); windows may be ragged, the cross-multiply
    normalizes for it.  Ties are 0 bits.

    One Arrow ``mapInPandas`` decode pass, no shuffle — the image_ahash
    posture.  A clip shorter than ``n_bits + 1`` frames gets a NULL
    fingerprint (it is valid data and must not abort the job); NULL
    rows are excluded from pairing by :func:`audio_near_dup_pairs`."""
    if n_bits < 1 or n_bits > 64:
        raise ValueError(f"n_bits must be in [1, 64], got {n_bits}")
    windows = n_bits + 1

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, prints, sums = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                au = audiocodec.wav_decode(_req_bytes(payload, "audio"))
                nf, ch = au.n_frames, au.n_channels
                if nf < windows:
                    # a short-but-decodable clip is DATA, not corruption:
                    # NULL fingerprint (never pairs) instead of one row
                    # killing the corpus job
                    ids.append(int(mid))
                    prints.append(None)
                    sums.append(sum(abs(v) for v in au.samples))
                    continue
                s, ln = [], []
                for b in range(windows):
                    f0 = b * nf // windows
                    f1 = (b + 1) * nf // windows
                    s.append(
                        sum(abs(v) for v in au.samples[f0 * ch : f1 * ch])
                    )
                    ln.append(f1 - f0)
                h = 0
                for i in range(n_bits):
                    if s[i + 1] * ln[i] > s[i] * ln[i + 1]:
                        h |= 1 << i
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(int(mid))
                prints.append(h)
                sums.append(sum(s))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "fingerprint": pd.array(prints, dtype="Int64"),
                    "energy_sum": pd.array(sums, dtype="int64"),
                }
            )

    return df.select(
        df[id_col].alias("media_id"), df[payload_col].alias(payload_col)
    ).mapInPandas(fn, _fp_schema(n_bits))


def audio_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    n_bits: int = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_bucket: int | None = None,
    fingerprint: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate AUDIO pairs by fingerprint Hamming distance —
    ``(media_a, media_b, hamming)``, the audio face of the generic
    Hamming engine (text simhash / image aHash / this).  Same plan
    shape and cap/audit contract as :func:`image_near_dup_pairs`;
    payloads never enter a join."""
    from .dedup import hamming_near_dup_pairs

    sig = (
        audio_fingerprint(df, n_bits, payload_col, id_col)
        if fingerprint is None
        else fingerprint
    )
    if "fingerprint" not in sig.columns:
        raise ValueError(
            "fingerprint frame lacks a 'fingerprint' column — build it "
            "with audio_fingerprint(df, ...)"
        )
    got = (sig.schema["fingerprint"].metadata or {}).get("fp_bits")
    if got is not None and int(got) != n_bits:
        raise ValueError(
            f"fingerprint frame was built with n_bits={got}; this call "
            f"passed n_bits={n_bits} — banding the wrong bit width makes "
            f"the high bands a single full-corpus bucket"
        )
    pairs = hamming_near_dup_pairs(
        # NULL fingerprints (short clips) never pair
        sig.filter(F.col("fingerprint").isNotNull()).select(
            F.col("media_id"), F.col("fingerprint").alias("simhash")
        ),
        bits=n_bits,
        max_hamming=max_hamming,
        id_col="media_id",
        max_bucket=max_bucket,
    )
    return pairs.select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


def image_dedup_corpus(
    df: DataFrame,
    max_hamming: int = 6,
    grid: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_bucket: int | None = None,
    ahash: DataFrame | None = None,
) -> DataFrame:
    """End-to-end perceptual image dedup: rows of ``df`` that survive —
    one min-id representative per connected near-dup component
    (transitive closure: A~B~C keeps exactly one even though (A, C) was
    never an emitted pair), all unpaired images kept.  The image face of
    ``dedup.dedup_by_clusters`` over :func:`image_near_dup_pairs`; the
    anti-join is id-keyed, so payloads ride through untouched and never
    enter a shuffle."""
    from .dedup import dedup_by_clusters

    pairs = image_near_dup_pairs(
        df,
        max_hamming=max_hamming,
        grid=grid,
        payload_col=payload_col,
        id_col=id_col,
        max_bucket=max_bucket,
        ahash=ahash,
    )
    return dedup_by_clusters(
        df, pairs, id_col=id_col, a_col="media_a", b_col="media_b"
    )


def audio_dedup_corpus(
    df: DataFrame,
    max_hamming: int = 6,
    n_bits: int = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_bucket: int | None = None,
    fingerprint: DataFrame | None = None,
) -> DataFrame:
    """End-to-end acoustic dedup: one min-id representative per
    connected fingerprint-near-dup component, unpaired clips kept —
    the audio twin of :func:`image_dedup_corpus` (same plan shape,
    payloads never shuffle)."""
    from .dedup import dedup_by_clusters

    pairs = audio_near_dup_pairs(
        df,
        max_hamming=max_hamming,
        n_bits=n_bits,
        payload_col=payload_col,
        id_col=id_col,
        max_bucket=max_bucket,
        fingerprint=fingerprint,
    )
    return dedup_by_clusters(
        df, pairs, id_col=id_col, a_col="media_a", b_col="media_b"
    )
