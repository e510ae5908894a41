"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas`` UDF
signatures, partition-size control — is shared by two codec tiers:

* REAL pure-numpy codecs (bottom of this module): PPM (P6) images, RIFF/WAVE
  PCM16 audio, and a PPMV multi-frame container — decode, nearest-neighbor
  resize, frame sampling, and feature extraction run END TO END in this
  container (round-trip + pipeline tested).
* ``decode_fn`` hooks for everything else (JPEG/MP3/H.264 need external
  libraries not present here): a production deployment passes a PIL /
  torchaudio / pyav decoder with the same ``bytes -> np.ndarray`` signature;
  nothing else changes. ``_stub_feature`` remains the dependency-free
  default for opaque payloads.

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


# ---------------------------------------------------------------------------
# REAL pure-numpy codecs — PPM (P6) images, WAV (PCM16) audio, and a trivial
# concatenated-PPM video container. No external media libraries needed, so
# the decode → feature/resize/frame-sample pipeline is exercisable END TO
# END in this environment; exotic codecs still enter through the same
# ``decode_fn`` hook with identical plumbing.
# ---------------------------------------------------------------------------


def encode_ppm(arr) -> bytes:
    """uint8 HxWx3 array → binary PPM (P6)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes):
    """binary PPM (P6) → uint8 HxWx3 array."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    data = parts[3][: w * h * 3]
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_wav_pcm16(samples, rate: int = 16000) -> bytes:
    """int16 1-D array → minimal RIFF/WAVE PCM16 mono."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(payload: bytes):
    """minimal RIFF/WAVE PCM16 mono → (int16 array, sample_rate)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate = struct.unpack("<I", payload[24:28])[0]
    n = struct.unpack("<I", payload[40:44])[0]
    return np.frombuffer(payload[44 : 44 + n], dtype="<i2"), rate


def encode_ppmv(frames) -> bytes:
    """list of uint8 HxWx3 arrays → 'PPMV' container (len-prefixed PPMs)."""
    import struct

    out = [b"PPMV", struct.pack("<I", len(frames))]
    for f in frames:
        p = encode_ppm(f)
        out.append(struct.pack("<I", len(p)))
        out.append(p)
    return b"".join(out)


def decode_ppmv(payload: bytes):
    """'PPMV' container → list of uint8 HxWx3 frames."""
    import struct

    if payload[:4] != b"PPMV":
        raise ValueError("not a PPMV payload")
    n = struct.unpack("<I", payload[4:8])[0]
    off, frames = 8, []
    for _ in range(n):
        ln = struct.unpack("<I", payload[off : off + 4])[0]
        off += 4
        frames.append(decode_ppm(payload[off : off + ln]))
        off += ln
    return frames


def synth_real_media(spark: SparkSession, n: int, seed: int = 42,
                     num_partitions: int | None = None) -> DataFrame:
    """Deterministic VALID payloads: P6 images (gradient patterns), PCM16
    WAV audio (mixed sines), PPMV multi-frame video."""
    kinds = ["image", "audio", "video"]

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
                if kind == "image":
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = np.stack(
                        [(xx * (3 + i)) % 256, (yy * (5 + i)) % 256,
                         (xx + yy + i) % 256], axis=-1
                    ).astype(np.uint8)
                    payload = encode_ppm(img)
                    meta = {"width": w, "height": h, "sample_rate": None,
                            "n_frames": None, "codec": "ppm"}
                elif kind == "audio":
                    t = np.arange(1600 + (i % 5) * 320)
                    s = (3000 * np.sin(t * (0.01 + 0.001 * (i % 7)))).astype(
                        np.int16
                    )
                    payload = encode_wav_pcm16(s, 16000)
                    meta = {"width": None, "height": None, "sample_rate": 16000,
                            "n_frames": None, "codec": "wav_pcm16"}
                else:
                    nf = 3 + i % 4
                    frames = []
                    for f in range(nf):
                        yy, xx = np.mgrid[0:h, 0:w]
                        frames.append(
                            np.stack(
                                [(xx + f * 7) % 256, (yy + i) % 256,
                                 (xx * yy + f) % 256], axis=-1
                            ).astype(np.uint8)
                        )
                    payload = encode_ppmv(frames)
                    meta = {"width": w, "height": h, "sample_rate": None,
                            "n_frames": nf, "codec": "ppmv"}
                rows.append(
                    {"media_id": i, "kind": kind, "payload": payload,
                     "meta": meta}
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    rng_df = spark.range(
        0, n, 1, num_partitions or spark.sparkContext.defaultParallelism
    )
    return rng_df.mapInPandas(gen, MEDIA_SCHEMA)


def real_feature(payload: bytes, dim: int):
    """REAL decode → feature: dispatches on magic bytes (P6/RIFF/PPMV),
    extracts per-channel means + histogram (image), RMS/zero-crossings +
    histogram (audio), or frame-mean image features (video)."""
    import numpy as np

    if payload.startswith(b"P6"):
        img = decode_ppm(payload).astype(np.float64)
        base = [img[..., c].mean() / 255.0 for c in range(3)]
        hist, _ = np.histogram(img, bins=dim - 3, range=(0, 256))
    elif payload[:4] == b"RIFF":
        s, _rate = decode_wav_pcm16(payload)
        sf = s.astype(np.float64) / 32768.0
        base = [float(np.sqrt((sf ** 2).mean())),
                float((np.diff(np.signbit(sf)) != 0).mean()), 0.0]
        hist, _ = np.histogram(sf, bins=dim - 3, range=(-1, 1))
    elif payload[:4] == b"PPMV":
        frames = decode_ppmv(payload)
        stack = np.stack(frames).astype(np.float64)
        base = [stack[..., c].mean() / 255.0 for c in range(3)]
        hist, _ = np.histogram(stack, bins=dim - 3, range=(0, 256))
    else:
        raise ValueError("unknown payload magic")
    v = np.concatenate([np.array(base), hist.astype(np.float64)])
    nrm = np.linalg.norm(v)
    return (v / nrm if nrm else v).astype(np.float32)


def resize_ppm(payload: bytes, new_w: int, new_h: int) -> bytes:
    """REAL nearest-neighbor resize of a P6 payload (numpy indexing)."""
    import numpy as np

    img = decode_ppm(payload)
    h, w, _ = img.shape
    yi = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    xi = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    return encode_ppm(img[yi][:, xi])


def sample_ppmv_frames(payload: bytes, k: int) -> list[bytes]:
    """REAL frame sampling: k evenly spaced frames re-encoded as PPM."""
    import numpy as np

    frames = decode_ppmv(payload)
    idx = np.linspace(0, len(frames) - 1, num=min(k, len(frames))).astype(int)
    return [encode_ppm(frames[i]) for i in idx]
