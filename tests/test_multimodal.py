"""Multimodal plumbing: schema, actor-pool decode, frame sampling,
determinism of the marked fake decode (no codecs in this env)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from bloomfilter_multithread_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    AudioFeatures,
    ImageDecode,
    decode_images,
    media_batch_size,
    sample_video_frames,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("media")
    pq.write_table(synth_media_table(40, seed=1, kind="image"), str(p / "images.parquet"))
    pq.write_table(synth_media_table(10, seed=2, kind="video"), str(p / "videos.parquet"))
    return p


def test_media_schema_roundtrip(media_path):
    t = pq.read_table(str(media_path / "images.parquet"))
    assert t.schema.equals(MEDIA_SCHEMA)
    assert t.column("payload").type == pa.binary()


def test_image_decode_pipeline(media_path):
    ds = ray.data.read_parquet(str(media_path / "images.parquet"))
    out = decode_images(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 40
    assert set(out.columns) == {"media_id", "height", "width", "features"}
    dims = {len(f) for f in out.features}
    assert dims == {14}  # 3 mean + 3 std + 8 hist bins
    # deterministic: same payload -> same features on a second run
    out2 = decode_images(
        ray.data.read_parquet(str(media_path / "images.parquet")), concurrency=2, batch_size=16
    ).to_pandas()
    a = out.sort_values("media_id").features.tolist()
    b = out2.sort_values("media_id").features.tolist()
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_frame_sampling(media_path):
    t = pq.read_table(str(media_path / "videos.parquet"))
    ds = ray.data.read_parquet(str(media_path / "videos.parquet"))
    out = sample_video_frames(ds, stride=4).to_pandas()
    expected = sum(len(range(0, nf, 4)) for nf in t.column("n_frames").to_pylist())
    assert len(out) == expected
    assert (out.frame_no % 4 == 0).all()
    assert out.media_id.str.contains("#f").all()


def test_fake_decode_is_content_addressed():
    t = synth_media_table(3, seed=9)
    dec = ImageDecode(target_hw=(8, 8))
    a = dec(t)
    b = dec(t.slice(1))  # different batch composition, same rows
    assert a.slice(1).column("features").to_pylist() == b.column("features").to_pylist()


def test_audio_features():
    pcm = (np.sin(np.linspace(0, 100, 4096)) * 2000).astype(np.int16)
    t = pa.table(
        {"media_id": pa.array(["a1"]), "payload": pa.array([pcm.tobytes()], pa.binary())}
    )
    out = AudioFeatures()(t)
    f = out.column("features").to_pylist()[0]
    assert len(f) == 4 and f[3] == 4096.0 and f[0] > 0


def test_media_batch_size():
    assert media_batch_size(64 << 20, 1 << 20) == 64
    assert media_batch_size(64 << 20, 512 << 20) == 1
