"""Multimodal opaque-binary columns (audio/video): Spark plumbing is real
(schemas, mapInPandas batch shapes, windowed feature math); the decoders
are deterministic fakes behind the documented NotImplementedError seam."""
import numpy as np
import pandas as pd
import pytest

from py3dtilers_spark.functions.multimodal import (
    audio_features,
    decode_audio_pcm,
    decode_video_frames,
    synth_audio,
    synth_video,
    video_frame_sample,
)


def test_real_containers_raise():
    with pytest.raises(NotImplementedError):
        decode_audio_pcm(b"RIFF....WAVEfmt ")
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"\x00\x00\x00 ftypisom", np.array([0]))


def test_audio_features_spark(spark):
    pdf = pd.DataFrame(
        {
            "media_id": [f"a{i}" for i in range(6)],
            "bytes": [synth_audio(seed=i * 17 + 1, n_samples=9000) for i in range(6)],
            "sample_rate": 16000,
            "n_channels": 1,
            "n_samples": 9000,
            "codec": "synth",
        }
    )
    df = spark.createDataFrame(pdf).repartition(3)
    out = audio_features(df, win_samples=4000).toPandas()
    # 9000 samples -> 2 full windows per clip
    assert len(out) == 12
    assert set(out["win"]) == {0, 1}
    # deterministic: same values on recompute, and equal to a local run
    local = decode_audio_pcm(synth_audio(seed=1, n_samples=9000))
    w0 = local[:4000]
    exp_rms = int(round(float(np.sqrt((w0.astype(np.float64) ** 2).mean())) * 1e6))
    row = out[(out["media_id"] == "a0") & (out["win"] == 0)].iloc[0]
    assert row["rms_e6"] == exp_rms
    assert row["zero_crossings"] > 0
    again = audio_features(df, win_samples=4000).toPandas()
    assert again.sort_values(["media_id", "win"]).reset_index(drop=True).equals(
        out.sort_values(["media_id", "win"]).reset_index(drop=True)
    )


def test_video_frame_sample_spark(spark):
    pdf = pd.DataFrame(
        {
            "media_id": ["v0", "v1"],
            "bytes": [
                synth_video(seed=7, n_frames=25, w=32, h=24),
                synth_video(seed=9, n_frames=5, w=32, h=24),
            ],
            "fps": 30.0,
            "n_frames": [25, 5],
            "w": 32,
            "h": 24,
            "codec": "synth",
        }
    )
    df = spark.createDataFrame(pdf).repartition(2)
    out = video_frame_sample(df, every_k=10).toPandas()
    # v0: frames 0,10,20; v1: frame 0
    got = {(r["media_id"], r["frame_idx"]) for _, r in out.iterrows()}
    assert got == {("v0", 0), ("v0", 10), ("v0", 20), ("v1", 0)}
    assert set(out["w"]) == {32} and set(out["h"]) == {24}
    # per-frame mean matches the local decode
    local = decode_video_frames(
        synth_video(seed=7, n_frames=25, w=32, h=24), np.array([10])
    )
    exp = int(round(float(local.reshape(1, -1).mean(axis=1)[0]) * 1000))
    row = out[(out["media_id"] == "v0") & (out["frame_idx"] == 10)].iloc[0]
    assert row["mean_intensity_e3"] == exp
