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


def _png(w, h):
    import struct
    import zlib

    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)) + b"rest")


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 10


def _bmp(w, h):
    import struct

    return (b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 20)


def _wav(ch, rate):
    import struct

    return (b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"fmt " + b"\x10\x00\x00\x00"
            + struct.pack("<HHI", 1, ch, rate) + b"\x00" * 16)


def _jpeg(w, h):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 3) + b"\x00" * 3
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_sniff_media_headers_real_formats(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.stages.multimodal import sniff_media_headers

    rows = [
        ("p", _png(640, 480)),
        ("g", _gif(320, 200)),
        ("b", _bmp(128, 256)),
        ("w", _wav(2, 44100)),
        ("j", _jpeg(1024, 768)),
        ("x", b"not a media file at all"),
        ("t", b"\x89PN"),  # truncated
    ]
    t = pa.table(
        {"media_id": pa.array([r[0] for r in rows]),
         "payload": pa.array([r[1] for r in rows], pa.binary())}
    )
    out = (
        sniff_media_headers(rd.from_arrow(t).repartition(3))
        .to_pandas().set_index("media_id")
    )
    assert out.loc["p", "format"] == "png" and (out.loc["p", ["width", "height"]] == [640, 480]).all()
    assert out.loc["g", "format"] == "gif" and (out.loc["g", ["width", "height"]] == [320, 200]).all()
    assert out.loc["b", "format"] == "bmp" and (out.loc["b", ["width", "height"]] == [128, 256]).all()
    assert out.loc["w", "format"] == "wav" and out.loc["w", "channels"] == 2 and out.loc["w", "sample_rate"] == 44100
    assert out.loc["j", "format"] == "jpeg" and (out.loc["j", ["width", "height"]] == [1024, 768]).all()
    assert out.loc["x", "format"] == "unknown" and out.loc["t", "format"] == "unknown"
    import pandas as pd

    assert pd.isna(out.loc["x", "width"]) and pd.isna(out.loc["t", "width"])


def test_phash_catches_reencoded_payload_byte_dedup_misses(ray_session):
    """A payload with the same first-8 content bytes but a different
    container tail decodes to identical pixels: perceptual dedup pairs
    it with the original (hamming 0) while exact byte hashing sees two
    distinct blobs."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from bloomfilter_multithread_ray.stages.multimodal import (
        media_phash_dups,
        synth_media_table,
    )

    base = synth_media_table(16, seed=11)
    payloads = base.column("payload").to_pylist()
    hs, ws = base.column("height").to_pylist(), base.column("width").to_pylist()
    tail = np.random.default_rng(4).integers(
        0, 256, len(payloads[3]) - 8, dtype=np.uint8
    ).tobytes()
    reenc = payloads[3][:8] + tail
    assert hashlib.md5(reenc).digest() != hashlib.md5(payloads[3]).digest()

    tbl = pa.table(
        {"media_ord": pa.array(list(range(16)) + [900], pa.int64()),
         "payload": pa.array(payloads + [reenc], pa.binary()),
         "height": pa.array(hs + [hs[3]], pa.int32()),
         "width": pa.array(ws + [ws[3]], pa.int32())}
    )
    pairs = media_phash_dups(ray.data.from_arrow(tbl), max_hamming=3).to_pandas()
    hit = pairs[(pairs.doc_a == 3) & (pairs.doc_b == 900)]
    assert len(hit) == 1 and hit["hamming"].iloc[0] == 0

    # partition invariance
    pairs2 = media_phash_dups(
        ray.data.from_arrow(tbl).repartition(5), max_hamming=3
    ).to_pandas()
    pd.testing.assert_frame_equal(
        pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        pairs2.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
    )
