"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The actual codecs (PIL/ffmpeg/torchaudio) are NOT
in this container, so the decode step is gated: with a codec installed it
runs for real; otherwise ``deterministic_fake=True`` produces seeded fake
outputs (so the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is fully real and tested), and
``deterministic_fake=False`` raises NotImplementedError as a clearly
marked stub.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_DDL = (
    "media_id long, kind string, data binary,"
    " meta struct<mime:string, width:int, height:int, sample_rate:int,"
    " duration_ms:int>"
)

DECODED_DDL = (
    "media_id long, kind string, width int, height int, n_frames int,"
    " decode_ok boolean"
)

FEATURE_DIM = 16
FEATURES_DDL = f"media_id long, features array<float>"


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


def _fake_dims(data: bytes):
    h = hashlib.md5(data).digest()
    w = 64 + struct.unpack("<H", h[:2])[0] % 1984
    ht = 64 + struct.unpack("<H", h[2:4])[0] % 1984
    frames = 1 + h[4] % 32
    return w, ht, frames


def decode_media(df: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Decode dimensions/frame counts from the binary column."""
    pil = _try_import_pil()

    def run(batches):
        import io

        for pdf in batches:
            rows = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                data = bytes(data)
                if pil is not None and kind == "image":
                    try:
                        im = pil.open(io.BytesIO(data))
                        rows.append((mid, kind, im.width, im.height, 1, True))
                        continue
                    except Exception:
                        rows.append((mid, kind, 0, 0, 0, False))
                        continue
                if not deterministic_fake:
                    raise NotImplementedError(
                        "media codecs not available in this environment; "
                        "install PIL/ffmpeg or pass deterministic_fake=True"
                    )
                w, h, fr = _fake_dims(data)
                rows.append((mid, kind, w, h, fr if kind == "video" else 1, True))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "n_frames",
                         "decode_ok"],
            )

    return df.select("media_id", "kind", "data").mapInPandas(
        run, schema=DECODED_DDL
    )


def extract_features(
    df: DataFrame,
    deterministic_fake: bool = True,
    model_fn=None,
) -> DataFrame:
    """Fixed-dim feature vector per media blob. ``model_fn`` is the
    embedding-MODEL hook (the seam a production deployment fills with
    CLIP/wav2vec/…): ``list[bytes] -> list[list[float]]``, called once
    per Arrow batch inside the pandas UDF — same contract as
    ``textquality.lang_id_with_model``. The demo instance is
    ``hashed_byte_embedder`` (deterministic, closed-form — exercised
    under the driver's oracle gate). Without a model: fake mode seeds
    the vector from md5 (plumbing stays real and tested);
    ``deterministic_fake=False`` raises as the clearly-marked stub."""

    def run(batches):
        for pdf in batches:
            blobs = [bytes(d) for d in pdf["data"]]
            if model_fn is not None:
                vecs = model_fn(blobs)
            else:
                vecs = []
                for data in blobs:
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "no embedding model available"
                        )
                    d = hashlib.md5(data).digest()
                    vecs.append([
                        (d[i % 16] * 256 + d[(i + 1) % 16]) / 65535.0
                        for i in range(FEATURE_DIM)
                    ])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": vecs}
            )

    return df.select("media_id", "data").mapInPandas(run, schema=FEATURES_DDL)


def hashed_byte_embedder(dim: int = FEATURE_DIM):
    """Demo model for the ``extract_features`` hook: a hashed-byte
    projection — embedding[j] = number of payload bytes ≡ j (mod dim).
    Deterministic with a closed-form SQL oracle (counts are small
    integers, exact in float32), so the model SEAM — batch shape, dim
    contract, Arrow round-trip — is verified end-to-end under the
    driver gate even though the real model is environment-blocked."""
    import numpy as np

    def model_fn(blobs):
        return [
            np.bincount(
                np.frombuffer(b, dtype=np.uint8) % dim, minlength=dim
            ).astype("float64").tolist()
            for b in blobs
        ]

    return model_fn


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame index (the decode of the actual frame is the stubbed step)."""
    meta_dur = F.col("meta.duration_ms")
    n = F.greatest(F.lit(1), F.floor(meta_dur / F.lit(every_ms)).cast("int"))
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * F.lit(every_ms))
    )


def synth_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                data = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
                meta = {
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                    "width": 640 if kind != "audio" else None,
                    "height": 480 if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "duration_ms": 5000 + (i % 10) * 1000 if kind != "image" else None,
                }
                rows.append((i, kind, data, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "data", "meta"])

    return spark.range(0, n, 1, 4).mapInPandas(gen, schema=MEDIA_DDL)


RESIZED_DDL = "media_id long, width int, height int, data binary, resize_ok boolean"


def resize_image(df: DataFrame, max_side: int = 256,
                 deterministic_fake: bool = True) -> DataFrame:
    """Aspect-preserving resize. With PIL present it resizes for real;
    fake mode preserves the plumbing (dimension math is real, the pixel
    payload is a seeded stand-in)."""
    pil = _try_import_pil()

    def run(batches):
        import io

        for pdf in batches:
            rows = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                data = bytes(data)
                if kind != "image":
                    continue
                if pil is not None:
                    try:
                        im = pil.open(io.BytesIO(data))
                        im.thumbnail((max_side, max_side))
                        buf = io.BytesIO()
                        im.save(buf, format=im.format or "PNG")
                        rows.append((mid, im.width, im.height,
                                     buf.getvalue(), True))
                        continue
                    except Exception:
                        rows.append((mid, 0, 0, b"", False))
                        continue
                if not deterministic_fake:
                    raise NotImplementedError("no image codec available")
                w, h, _ = _fake_dims(data)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                fake = hashlib.md5(data + b"resized").digest() * 8
                rows.append((mid, nw, nh, fake, True))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "data",
                               "resize_ok"],
            )

    return df.select("media_id", "kind", "data").mapInPandas(
        run, schema=RESIZED_DDL
    )
