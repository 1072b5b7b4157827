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


def parse_image_dims(p: bytes):
    """(width, height) from the image HEADER alone — PNG / BMP / GIF
    fixed offsets, JPEG SOF-marker scan (all public container
    formats).  This is a real metadata decode needing no codec
    library, so width/height are honest even in codec-less
    containers; full pixel decode still requires Pillow.  Returns
    None when the payload is not a recognized image."""
    if not p:
        return None
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
        return (int.from_bytes(p[16:20], "big"),
                int.from_bytes(p[20:24], "big"))
    if p[:2] == b"BM" and len(p) >= 26:
        w = int.from_bytes(p[18:22], "little", signed=True)
        h = int.from_bytes(p[22:26], "little", signed=True)
        return abs(w), abs(h)
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        return (int.from_bytes(p[6:8], "little"),
                int.from_bytes(p[8:10], "little"))
    if p[:2] == b"\xff\xd8":                      # JPEG: find SOFn
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                break
            marker = p[i + 1]
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seglen = int.from_bytes(p[i + 2:i + 4], "big")
            if (0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)):
                return (int.from_bytes(p[i + 7:i + 9], "big"),
                        int.from_bytes(p[i + 5:i + 7], "big"))
            i += 2 + seglen
    return None


def synth_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24-bit BMP (zeroed pixels) — the deterministic
    synthetic image used by tests and the driver row (no image
    assets ship in this environment)."""
    import struct
    row = ((width * 3 + 3) // 4) * 4
    data = row * height
    return (b"BM" + struct.pack("<IHHI", 54 + data, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                          0, data, 2835, 2835, 0, 0)
            + bytes(data))


def decode_media_real(payload: bytes, media_type: str):
    """Real decode: Pillow for images when importable
    (width/height/n_frames from the full decoder), else the built-in
    header parser (real width/height, n_frames=1).  Audio/video hooks
    (torchaudio / PyAV) follow the same contract when those libs are
    present.  Raises when neither path can read the payload."""
    if media_type == "image" and _PILImage is not None:
        from io import BytesIO
        with _PILImage.open(BytesIO(payload or b"")) as im:
            return (len(payload or b""),
                    hashlib.sha256(payload or b"").hexdigest(),
                    int(im.width), int(im.height),
                    int(getattr(im, "n_frames", 1)))
    if media_type == "image":
        dims = parse_image_dims(payload or b"")
        if dims is not None:
            return (len(payload or b""),
                    hashlib.sha256(payload or b"").hexdigest(),
                    int(dims[0]), int(dims[1]), 1)
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

    magics = (b"\x89PNG\r\n\x1a\n", b"BM", b"GIF8", b"\xff\xd8\xff")

    def _one(mid, mtype, payload):
        if mode == "real" or (
                mode == "auto" and mtype == "image" and payload
                and (_PILImage is not None
                     or bytes(payload).startswith(magics))):
            # auto mode probes the magic bytes first: without a
            # codec, an unrecognizable payload would otherwise pay a
            # raise-and-catch per ROW across the whole corpus just to
            # land in the stub
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
