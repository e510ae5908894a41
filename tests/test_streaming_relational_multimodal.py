from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_graph


# ---- streaming --------------------------------------------------------------


def _event(i, minutes, user, typ="click", value=1.0):
    return (
        i,
        dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minutes),
        user,
        typ,
        value,
        "{}",
    )


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    from graphscope_spark.streaming.events import (
        run_available_now,
        stream_from_parquet_dir,
        windowed_counts,
    )

    rows = [_event(i, i * 7, 1 + i % 3, ["click", "view"][i % 2]) for i in range(40)]
    src = str(tmp_path / "events_src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(src)

    stream = stream_from_parquet_dir(spark, src)
    got = run_available_now(
        windowed_counts(stream, window="1 hour", watermark="2 hours"),
        str(tmp_path / "ck1"),
        output_mode="complete",
    )
    got_map = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"]) for r in got}

    batch = spark.read.parquet(src)
    want = (
        batch.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .collect()
    )
    want_map = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"]) for r in want}
    assert got_map == want_map


def test_sessionize_gap_sessions(spark, tmp_path):
    from graphscope_spark.streaming.events import (
        run_available_now,
        sessionize,
        stream_from_parquet_dir,
    )

    # user 7: two bursts separated by >30min gap -> first session closes
    rows = [
        _event(1, 0, 7), _event(2, 5, 7), _event(3, 10, 7),
        _event(4, 60, 7), _event(5, 65, 7),
        _event(6, 0, 8),
    ]
    src = str(tmp_path / "events_src2")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(src)
    stream = stream_from_parquet_dir(spark, src)
    got = run_available_now(sessionize(stream), str(tmp_path / "ck2"))
    # only the closed session (user 7, burst 1) is emitted; open ones wait
    assert len(got) == 1
    s = got[0]
    assert s["user_id"] == 7 and s["n_events"] == 3
    assert s["session_start"] == dt.datetime(2024, 1, 1, 0, 0)
    assert s["session_end"] == dt.datetime(2024, 1, 1, 0, 10)


# ---- relational / traversal -------------------------------------------------


def test_edge_expand_and_degree(spark):
    from graphscope_spark.operators.relational import edge_expand, expand_degree

    g = make_graph(spark, [(1, 2), (1, 3), (2, 3), (3, 1)], [1, 2, 3])
    frontier = spark.createDataFrame([(1,), (3,)], "v long")
    out = edge_expand(frontier, g.edges, "out")
    assert sorted((r["v"], r["w"]) for r in out.collect()) == [(1, 2), (1, 3), (3, 1)]
    both = expand_degree(frontier, g.edges, "both")
    assert {r["v"]: r["degree"] for r in both.collect()} == {1: 3, 3: 3}
    g.unpersist()


def test_path_expand_semantics(spark):
    from graphscope_spark.operators.relational import path_expand

    # cycle 1->2->3->1 plus chord 2->1
    g = make_graph(spark, [(1, 2), (2, 3), (3, 1), (2, 1)], [1, 2, 3])
    start = spark.createDataFrame([(1,)], "v long")
    arb = path_expand(start, g.edges, 1, 3, "arbitrary")
    simple = path_expand(start, g.edges, 1, 3, "simple")
    arb_paths = {tuple(r["path"]) for r in arb.collect()}
    simple_paths = {tuple(r["path"]) for r in simple.collect()}
    assert (1, 2, 1) in arb_paths
    assert all(len(set(p)) == len(p) for p in simple_paths)
    assert (1, 2, 3) in simple_paths
    g.unpersist()


def test_sample_deterministic_across_partitions(spark):
    from graphscope_spark.operators.relational import sample_n

    df4 = spark.range(0, 1000, 1, 4).select(F.col("id").alias("x"))
    df32 = spark.range(0, 1000, 1, 32).select(F.col("id").alias("x"))
    a = sorted(r["x"] for r in sample_n(df4, 25).collect())
    b = sorted(r["x"] for r in sample_n(df32, 25).collect())
    assert a == b and len(a) == 25


# ---- multimodal -------------------------------------------------------------


def test_multimodal_pipeline(spark):
    from graphscope_spark.operators.multimodal import (
        decode_features,
        resize_images,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, 30).cache()
    assert media.count() == 30
    feats = decode_features(media, dim=16).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == 16
        assert abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-3  # L2-normalized
    imgs = resize_images(media, 32, 32).collect()
    assert all(r["meta"]["width"] == 32 and r["meta"]["height"] == 32 for r in imgs)
    assert len(imgs) == media.filter("kind = 'image'").count()
    frames = sample_frames(media, every_n=10)
    vids = media.filter("kind = 'video'").count()
    assert frames.select("media_id").distinct().count() == vids
    media.unpersist()


def test_media_deterministic(spark):
    from graphscope_spark.operators.multimodal import synth_media

    a = {r["media_id"]: bytes(r["payload"]) for r in synth_media(spark, 10, num_partitions=2).collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in synth_media(spark, 10, num_partitions=5).collect()}
    assert a == b


def test_real_codecs_roundtrip_and_pipeline(spark):
    """The REAL (pure-numpy) codec path end to end: valid PPM/WAV/PPMV
    payloads decode, resize, frame-sample, and featurize through the same
    mapInPandas plumbing as the stub path."""
    import numpy as np

    from graphscope_spark.operators.multimodal import (
        decode_features,
        decode_ppm,
        decode_ppmv,
        decode_wav_pcm16,
        encode_ppm,
        encode_ppmv,
        encode_wav_pcm16,
        real_feature,
        resize_ppm,
        sample_ppmv_frames,
        synth_real_media,
    )

    # codec round-trips
    img = (np.arange(14 * 10 * 3, dtype=np.uint8).reshape(10, 14, 3) * 3) % 256
    assert (decode_ppm(encode_ppm(img)) == img).all()
    s = (np.sin(np.arange(500) * 0.05) * 20000).astype(np.int16)
    back, rate = decode_wav_pcm16(encode_wav_pcm16(s, 8000))
    assert rate == 8000 and (back == s).all()
    frames = [img, (img + 1) % 256, (img + 2) % 256]
    got = decode_ppmv(encode_ppmv(frames))
    assert len(got) == 3 and all((a == b).all() for a, b in zip(got, frames))

    # real resize + frame sampling
    small = decode_ppm(resize_ppm(encode_ppm(img), 7, 5))
    assert small.shape == (5, 7, 3)
    sampled = sample_ppmv_frames(encode_ppmv(frames), 2)
    assert len(sampled) == 2 and decode_ppm(sampled[0]).shape == img.shape

    # distributed pipeline over VALID payloads with the REAL decoder
    media = synth_real_media(spark, 30)
    feats = decode_features(media, dim=16, decode_fn=real_feature).collect()
    assert len(feats) == 30
    for r in feats:
        v = np.array(r["feature"])
        assert v.shape == (16,) and np.isfinite(v).all()
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # deterministic across runs
    feats2 = decode_features(
        synth_real_media(spark, 30), dim=16, decode_fn=real_feature
    ).collect()
    m1 = {r["media_id"]: list(r["feature"]) for r in feats}
    m2 = {r["media_id"]: list(r["feature"]) for r in feats2}
    assert m1 == m2
