"""Audio modality: WAV codec round-trip, stub gates, actor-pool stages
(decode-stats / frame features / resample) and the driver query."""

import numpy as np
import pyarrow as pa
import pytest

from entity_deduplication_hack_main_ray.functions.codecs import (
    UnsupportedFormatError,
    decode_audio,
    decode_wav,
    encode_wav,
)
from entity_deduplication_hack_main_ray.pipelines.audio import (
    AudioDecodeStats,
    AudioFeatures,
    AudioResample,
    audio_features_pipeline,
    audio_frame_features,
    synth_audio_batch,
)

SR = 8000


def _tone(freq: float, n: int = 4000, amp: float = 0.5) -> np.ndarray:
    t = np.arange(n) / SR
    return np.clip(
        np.round(amp * np.sin(2 * np.pi * freq * t) * 32768.0), -32768, 32767
    ).astype(np.int16)


def _clips_table(rows):
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.string()),
            "bytes": pa.array([r[1] for r in rows], pa.binary()),
            "fmt": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_wav_roundtrip_mono_and_stereo():
    mono = _tone(440)
    s, sr = decode_wav(encode_wav(mono, SR))
    assert sr == SR and np.array_equal(s, mono)
    stereo = np.stack([_tone(440), _tone(880)], axis=1)
    s2, sr2 = decode_wav(encode_wav(stereo, SR))
    assert sr2 == SR and s2.shape == (4000, 2) and np.array_equal(s2, stereo)


def test_audio_stub_gates():
    with pytest.raises(UnsupportedFormatError):
        decode_audio(b"ID3\x04whatever", "mp3")
    with pytest.raises(ValueError):
        decode_wav(b"nonsense")
    # float-WAV variant hits the explicit gate, not a silent wrong decode
    bad = bytearray(encode_wav(_tone(440), SR))
    bad[20] = 3  # fmt tag: IEEE float
    with pytest.raises(UnsupportedFormatError):
        decode_wav(bytes(bad))


def test_decode_stats_stage_values_and_null_tolerance():
    clips = _clips_table(
        [
            ("a", encode_wav(_tone(440), SR), "wav"),
            ("b", b"\xff\xfb\x90corrupt", "mp3"),
        ]
    )
    out = AudioDecodeStats()(clips).to_pydict()
    assert out["ok"] == [True, False]
    assert out["sample_rate"][0] == SR
    assert out["n_samples"][0] == 4000
    assert out["duration_ms"][0] == 500
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ~ 0.3536
    assert abs(out["rms_e6"][0] / 1e6 - 0.5 / np.sqrt(2)) < 1e-3
    assert out["rms_e6"][1] == 0 and out["duration_ms"][1] == 0


def test_features_stage_centroid_tracks_tone_frequency():
    # pure tones: spectral centroid must sit near the tone frequency
    clips = _clips_table(
        [
            ("low", encode_wav(_tone(400), SR), "wav"),
            ("high", encode_wav(_tone(2000), SR), "wav"),
            ("short", encode_wav(_tone(440, n=100), SR), "wav"),  # < frame
            ("bad", b"junk", "flac"),
        ]
    )
    out = AudioFeatures(frame_len=1024, hop=512)(clips).to_pydict()
    ids = np.array(out["media_id"])
    cent = np.array(out["centroid_mhz"]) / 1000.0  # Hz
    # 4000 samples, frame 1024 hop 512 → 6 full frames per decodable clip
    assert (ids == "low").sum() == 6 and (ids == "high").sum() == 6
    assert "short" not in ids and "bad" not in ids
    assert np.all(np.abs(cent[ids == "low"] - 400) < 60)
    assert np.all(np.abs(cent[ids == "high"] - 2000) < 60)
    # identical frames of a stationary tone → identical integer features
    assert len(set(np.array(out["energy_e6"])[ids == "low"][1:-1])) == 1


def test_resample_stage_halves_rate_keeps_tone():
    clips = _clips_table([("a", encode_wav(_tone(400), SR), "wav")])
    out = AudioResample(target_sr=4000)(clips).to_pydict()
    assert out["ok"] == [True] and out["fmt"] == ["wav"]
    s, sr = decode_wav(out["bytes_out"][0])
    assert sr == 4000 and len(s) == 2000
    # the 400 Hz tone survives resampling: centroid of the result ~ 400
    feat = AudioFeatures(frame_len=512, hop=256)(
        _clips_table([("r", encode_wav(s, sr), "wav")])
    ).to_pydict()
    cent = np.array(feat["centroid_mhz"]) / 1000.0
    assert np.all(np.abs(cent - 400) < 80)


def test_audio_features_pipeline_and_query(ray_session):
    import ray.data

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 3, 19], pa.int64())})
    )
    clips = docs.map_batches(synth_audio_batch, batch_format="pyarrow")
    out = audio_features_pipeline(clips).to_pandas()
    # every clip is 4000 samples → 6 frames each
    assert sorted(out["media_id"].unique()) == ["doc-0", "doc-19", "doc-3"]
    assert (out.groupby("media_id").size() == 6).all()
    # doc 0: tones 200 + 1200 Hz at 2:1 amplitude → centroid between them
    c0 = out[out["media_id"] == "doc-0"]["centroid_mhz"].to_numpy() / 1000.0
    assert np.all((c0 > 200) & (c0 < 1200))
    # driver query over real testdata (500 docs at sf0.001)
    q = audio_frame_features("/root/testdata/sf0.001")
    assert len(q) == 500 * 6
    assert list(q.columns) == [
        "media_id", "frame_idx", "energy_e6", "centroid_mhz",
    ]


def test_synth_batch_layout_independent():
    t = pa.table({"doc_id": pa.array([5, 6, 7], pa.int64())})
    whole = synth_audio_batch(t).to_pydict()
    split = [
        synth_audio_batch(t.slice(i, 1)).to_pydict() for i in range(3)
    ]
    for i in range(3):
        assert whole["bytes"][i] == split[i]["bytes"][0]


def test_resample_degenerate_wav_null_tolerant():
    # zero-sample WAV is spec-valid: must yield ok=False, not crash
    empty_wav = encode_wav(np.array([], dtype=np.int16), SR)
    out = AudioResample(target_sr=4000)(
        _clips_table([("e", empty_wav, "wav"), ("a", encode_wav(_tone(440), SR), "wav")])
    ).to_pydict()
    assert out["ok"] == [False, True]


def test_decode_stats_full_scale_negative_peak():
    # np.abs(int16(-32768)) wraps negative; the stage must report +32768
    s = np.full(100, -32768, dtype=np.int16)
    out = AudioDecodeStats()(
        _clips_table([("p", encode_wav(s, SR), "wav")])
    ).to_pydict()
    assert out["peak"][0] == 32768
