"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as BinaryType columns; decode/resize/
frame-sample run as Arrow-batched ``mapInPandas`` stages.  The actual codec
libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so decoding is
split into:

- ``media_metadata``   — REAL: size, sha256, magic-byte sniffing, plus a
  deterministic fake decode (dims derived from the digest) whose arithmetic
  is SQL-expressible, so the driver can oracle-check the UDF plumbing
  end-to-end.
- ``decode_image``     — STUB: raises NotImplementedError without PIL; the
  Spark-side schema, batching, and partitioning are real and tested.
- ``sample_frames``    — REAL plumbing over the fake decode: deterministic
  frame-index sampling, one output row per sampled frame.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

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
    (b"RIFF", "audio/wav"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
]


def _sniff(payload: bytes) -> str:
    for magic, kind in _MAGIC:
        if payload.startswith(magic):
            return kind
    return "application/octet-stream"


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
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
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
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
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


def resize_image(
    payload: bytes, width: int, height: int
):  # pragma: no cover - stub without PIL
    """Real resize requires PIL — not installed in this container.  The
    Spark-side shape for a resize stage is ``mapInPandas`` over binary in
    → binary out with (width, height) metadata columns, identical to
    media_metadata's plumbing."""
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image resize requires PIL; not installed in this environment"
        ) from e
    img = Image.open(io.BytesIO(payload)).resize((width, height))
    out = io.BytesIO()
    img.save(out, format="PNG")
    return out.getvalue()


def decode_image(payload: bytes):  # pragma: no cover - stub without PIL
    """Real decode — requires PIL, not available in this container."""
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; not installed in this environment"
        ) from e
    return Image.open(io.BytesIO(payload))


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

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fis, shas = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
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
