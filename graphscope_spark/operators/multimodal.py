"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow-batched
``mapInPandas`` UDF signatures, partition-size control — while the actual
codec work is STUBBED behind ``decode_fn`` hooks (image/audio libraries are
not in this container). A production deployment passes a real decoder (PIL /
torchaudio / pyav) with the same signature; nothing else changes.

Schema convention:

    media(media_id long, kind string, payload binary,
          meta struct<width int, height int, sample_rate int,
                      n_frames int, codec string>)

Operators:
* synth_media       — deterministic fake payloads for tests/benchmarks
* decode_features   — payload → fixed-size float vector (stub: seeded bytes
                      → normalized histogram; real: CNN features)
* resize_images     — payload → payload' (stub: deterministic truncation
                      tagged with the new size; real: PIL resize)
* sample_frames     — video payload → array of frame payloads (stub: evenly
                      spaced byte slices; real: pyav keyframe sampling)

Each is ``mapInPandas`` over binary columns: Arrow moves the bytes
zero-copy, pandas sees ``bytes`` objects, numpy does the vector math —
no per-row Python beyond the stubbed codec boundary itself.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["MEDIA_SCHEMA", "synth_media", "decode_features", "resize_images",
           "sample_frames"]

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)


def synth_media(spark: SparkSession, n: int, seed: int = 42,
                num_partitions: int | None = None) -> DataFrame:
    """Deterministic opaque payloads (xxhash64-seeded bytes)."""
    kinds = ["image", "audio", "video"]

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                kind = kinds[i % 3]
                size = 256 + (i * 37) % 1024
                payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
                meta = {
                    "width": 64 + (i % 8) * 16 if kind == "image" else None,
                    "height": 64 + (i % 5) * 16 if kind == "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": 30 + i % 60 if kind == "video" else None,
                    "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
                }
                rows.append({"media_id": i, "kind": kind, "payload": payload, "meta": meta})
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    rng_df = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, MEDIA_SCHEMA)


def _stub_feature(payload: bytes, dim: int):
    """STUB decode: byte-histogram → L2-normalized vector. A real deploy
    replaces this with an actual decoder+model; the Spark plumbing
    (signature: bytes -> np.ndarray[dim]) is identical."""
    import numpy as np

    h, _ = np.histogram(np.frombuffer(payload, dtype=np.uint8), bins=dim, range=(0, 256))
    v = h.astype(np.float64)
    nrm = np.linalg.norm(v)
    return (v / nrm if nrm else v).astype(np.float32)


def decode_features(
    media: DataFrame,
    dim: int = 32,
    decode_fn: Callable[[bytes, int], "object"] | None = None,
    batch_rows: int = 1024,
) -> DataFrame:
    """(media_id, kind, feature: array<float>) — Arrow-batched feature
    extraction; ``decode_fn(payload, dim)`` defaults to the stub."""
    fn = decode_fn or _stub_feature

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [fn(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        extract, "media_id long, kind string, feature array<float>"
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: keeps plumbing honest (filter to images, new meta struct,
    payload transform boundary). Real impl: PIL.Image.resize in the loop."""

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        target = width * height // 64 + 16
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"][:target]  # STUB: deterministic truncation
                meta = dict(row["meta"]) if row["meta"] is not None else {}
                meta.update({"width": width, "height": height})
                out.append({"media_id": row["media_id"], "kind": row["kind"],
                            "payload": payload, "meta": meta})
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "meta"])

    return media.filter(F.col("kind") == "image").mapInPandas(resize, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB frame sampling: (media_id, frame_no, frame: binary) — evenly
    spaced byte slices standing in for decoded keyframes."""

    def frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, nos, blobs = [], [], []
            for _, row in pdf.iterrows():
                n_frames = (row["meta"]["n_frames"] or 0) if row["meta"] is not None else 0
                payload = row["payload"]
                chunk = max(len(payload) // max(n_frames, 1), 1)
                for f in range(0, n_frames, every_n):
                    ids.append(row["media_id"])
                    nos.append(f)
                    blobs.append(payload[f * chunk : (f + 1) * chunk])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": blobs})

    return media.filter(F.col("kind") == "video").mapInPandas(
        frames, "media_id long, frame_no int, frame binary"
    )
