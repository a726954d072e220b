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


def test_video_stage_is_stub_gated():
    with pytest.raises(UnsupportedFormatError):
        VideoFrameSample()(pa.table({"media_id": pa.array(["x"])}))
