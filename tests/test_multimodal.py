import pyarrow as pa
import pytest

from entity_deduplication_hack_main_ray.config import PipelineConfig
from entity_deduplication_hack_main_ray.functions.codecs import (
    UnsupportedFormatError,
)
from entity_deduplication_hack_main_ray.pipelines.multimodal import (
    ImageDecodeStats,
    ImageEmbed,
    ImageResize,
    VideoFrameSample,
    image_stats_pipeline,
)


def test_image_stats_pipeline(ray_session, tiny_corpus):
    corpus_dir, _ = tiny_corpus
    out = image_stats_pipeline(corpus_dir).to_pandas()
    assert out["ok"].all()
    assert (out["height"] > 0).all() and (out["channels"] == 3).all()


def test_image_resize_stage(ray_session, tiny_corpus):
    import ray.data

    corpus_dir, _ = tiny_corpus
    ds = ray.data.read_parquet(corpus_dir, columns=["image_id", "bytes", "fmt"])
    out = ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"out_size": 16},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 2),
    ).to_pandas()
    assert out["ok"].all()
    from entity_deduplication_hack_main_ray.functions.codecs import decode_png

    px = decode_png(out["bytes_out"].iloc[0])
    assert px.shape == (16, 16)


def test_image_embed_stage(ray_session, tiny_corpus):
    import numpy as np
    import ray.data

    corpus_dir, _ = tiny_corpus
    ds = ray.data.read_parquet(corpus_dir, columns=["image_id", "bytes", "fmt"])
    out = ds.map_batches(
        ImageEmbed,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 2),
    ).to_pandas()
    assert out["ok"].all()
    v = np.array(out["embedding"].iloc[0])
    assert v.shape == (64,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_undecodable_rows_flow_not_fail():
    stats = ImageDecodeStats(PipelineConfig())
    t = pa.table(
        {
            "image_id": pa.array(["x"], pa.string()),
            "bytes": pa.array([b"notanimage"], pa.binary()),
            "fmt": pa.array(["webp"], pa.string()),
        }
    )
    out = stats(t)
    assert out["ok"].to_pylist() == [False]


def test_video_frame_sampling_fake_container(ray_session):
    """Real plumbing test: a deterministic fvid container → one row per
    sampled frame, PNG-re-encoded, losslessly matching the source frames."""
    import numpy as np
    import ray.data

    from entity_deduplication_hack_main_ray.functions.codecs import (
        decode_png,
        encode_fake_video,
    )
    from entity_deduplication_hack_main_ray.pipelines.multimodal import (
        video_frame_pipeline,
    )

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(10, 12, 16, 3), dtype=np.uint8)
    blob = encode_fake_video(frames, fps=5)
    videos = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(["vid-1"], pa.string()),
                "bytes": pa.array([blob], pa.binary()),
                "fmt": pa.array(["fvid"], pa.string()),
            }
        )
    )
    out = video_frame_pipeline(videos, every_n_frames=4).to_pandas()
    assert out["frame_idx"].tolist() == [0, 4, 8]
    assert out["ok"].all()
    for _, row in out.iterrows():
        assert np.array_equal(decode_png(row["frame_png"]), frames[row["frame_idx"]])


def test_video_real_formats_stub_gated():
    """mp4/webm (no ffmpeg here) flow as ok=False rows — null-tolerant,
    with the stub gate at the codec layer."""
    out = VideoFrameSample()(
        pa.table(
            {
                "media_id": pa.array(["x"], pa.string()),
                "bytes": pa.array([b"\x00\x00\x00 ftypmp42"], pa.binary()),
                "fmt": pa.array(["mp4"], pa.string()),
            }
        )
    )
    assert out["ok"].to_pylist() == [False]

    from entity_deduplication_hack_main_ray.functions.codecs import decode_video

    with pytest.raises(UnsupportedFormatError):
        decode_video(b"...", "mp4")


def test_video_pipeline_filters_failed_decodes(ray_session):
    """Undecodable media must not reach downstream image stages as empty
    payloads (default), but stay auditable with keep_failed=True."""
    import ray.data

    from entity_deduplication_hack_main_ray.functions.codecs import (
        encode_fake_video,
    )
    from entity_deduplication_hack_main_ray.pipelines.multimodal import (
        video_frame_pipeline,
    )

    import numpy as np

    frames = np.zeros((4, 8, 8, 3), dtype=np.uint8)
    videos = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(["good", "bad"], pa.string()),
                "bytes": pa.array(
                    [encode_fake_video(frames, fps=5), b"\x00ftypmp42"],
                    pa.binary(),
                ),
                "fmt": pa.array(["fvid", "mp4"], pa.string()),
            }
        )
    )
    out = video_frame_pipeline(videos, every_n_frames=2).to_pandas()
    assert out["ok"].all() and set(out["media_id"]) == {"good"}
    audited = video_frame_pipeline(
        videos, every_n_frames=2, keep_failed=True
    ).to_pandas()
    assert set(audited[~audited["ok"]]["media_id"]) == {"bad"}


def test_synth_video_layout_independent():
    import pyarrow as pa

    from entity_deduplication_hack_main_ray.pipelines.multimodal import (
        synth_video_batch,
    )

    t = pa.table({"doc_id": pa.array([1, 2, 102], pa.int64())})
    whole = synth_video_batch(t).to_pydict()
    for i in range(3):
        part = synth_video_batch(t.slice(i, 1)).to_pydict()
        assert whole["bytes"][i] == part["bytes"][0]


def test_video_frame_stats_query_pins_ramp(ray_session):
    import numpy as np

    from entity_deduplication_hack_main_ray.pipelines.multimodal import (
        video_frame_stats,
    )

    out = video_frame_stats("/root/testdata/sf0.001")
    # 500 docs × 8 frames sampled every 2 → 4 rows per clip
    assert len(out) == 500 * 4
    assert list(out.columns) == ["media_id", "frame_idx", "mean_e6"]
    assert sorted(out["frame_idx"].unique()) == [0, 2, 4, 6]
    # per-doc brightness ramp: doc 0 → base 0, step 1, row gradient mean 7.5
    d0 = out[out["media_id"] == "vid-0"].sort_values("frame_idx")
    expect = (np.array([0, 2, 4, 6]) + 7.5) * 1e6
    assert np.array_equal(d0["mean_e6"].to_numpy(), expect.astype(np.int64))
