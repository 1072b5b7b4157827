"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct.  The *Spark-side* machinery — schema, Arrow batch
shape, ``mapInPandas`` signatures, partitioning — is real and tested;
the codec step probes for Pillow at import: when importable, image
payloads decode for real (width/height/n_frames); otherwise — or when
a payload fails to decode — ``decode_media`` falls back to the
deterministic stub so the pipeline shape is testable in codec-less
containers.  The ``decoded`` output column records which path each
row took.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:                                  # feature probe, never required
    from PIL import Image as _PILImage
    HAVE_PIL = True
except Exception:                     # pragma: no cover - env dependent
    _PILImage = None
    HAVE_PIL = False

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("payload", T.BinaryType()),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("width", T.IntegerType()),   # real (Pillow) or pseudo
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("decoded", T.BooleanType()),  # True = real codec path
])


def decode_media_real(payload: bytes, media_type: str):
    """Real decode: Pillow for images (width/height/n_frames).  Audio/
    video hooks (torchaudio / PyAV) follow the same contract when
    those libs are present.  Raises when no codec is available."""
    if media_type == "image" and _PILImage is not None:
        from io import BytesIO
        with _PILImage.open(BytesIO(payload or b"")) as im:
            return (len(payload or b""),
                    hashlib.sha256(payload or b"").hexdigest(),
                    int(im.width), int(im.height),
                    int(getattr(im, "n_frames", 1)))
    raise NotImplementedError(
        "no codec for media_type=%r in this environment; "
        "decode_media() provides the deterministic stub" % (media_type,))


def _stub_features(payload: bytes, media_type: str):
    """Deterministic fake decode: dims derived from the content hash
    so the full pipeline (schema, batching, joins) is testable."""
    digest = hashlib.sha256(payload or b"").digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    frames = 1 if media_type == "image" else 1 + digest[2] % 60
    return len(payload or b""), hashlib.sha256(payload or b"").hexdigest(), \
        w, h, frames


def decode_media(df: DataFrame, mode: str = "auto") -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA rows.

    Arrow-batched; one Python crossing per batch, vectorizable body.
    ``mode``: "auto" (real codec when importable and the payload
    decodes, stub otherwise — the default), "stub" (always the
    deterministic stub), "real" (raise on any undecodable payload).
    """
    if mode not in ("auto", "stub", "real"):
        raise ValueError(mode)
    if mode == "auto" and not HAVE_PIL:
        mode = "stub"          # no codec probe hit: skip per-row tries

    def _one(mid, mtype, payload):
        if mode != "stub":
            try:
                return (mid, mtype, *decode_media_real(payload, mtype),
                        True)
            except Exception:
                if mode == "real":
                    raise
        return (mid, mtype, *_stub_features(payload, mtype), False)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _one(mid, mtype, payload)
                for mid, mtype, payload in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(feats, columns=[
                f.name for f in FEATURES_SCHEMA])

    return df.mapInPandas(_run, schema=FEATURES_SCHEMA)


def media_from_webtext(webtext: DataFrame) -> DataFrame:
    """Adapter: treat the html payloads as opaque media for pipeline
    tests (the synthetic corpus has no real images)."""
    return webtext.select(
        F.col("url").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.col("html").alias("payload"))


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expands (media_id, n_frames) to
    one row per sampled frame index — pure SQL expansion; the actual
    frame decode is the stubbed step."""
    feats = decode_media(df)
    return feats.select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)),
            F.lit(every_n))).alias("frame_idx"))
