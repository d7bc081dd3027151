"""Multimodal stages: real image decode/resize/features, stubbed
audio/video with real Ray plumbing."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def media_table(ray_session, tmp_path_factory):
    from dup_ocropy_ray.sources.fixtures import build_corpus

    root = tmp_path_factory.mktemp("mm")
    paths = build_corpus(str(root), num_docs=4, seed=11)
    return paths["media"]


def test_image_features_stage(ray_session, media_table):
    from dup_ocropy_ray.stages.multimodal import ImageFeatures

    ds = rd.read_parquet(media_table)
    out = ds.map_batches(ImageFeatures, batch_format="pyarrow", batch_size=2,
                         concurrency=1).to_pandas()
    ok = out[out.status == "ok"]
    assert len(ok) == len(out)
    # the ".mask" sibling entry is dark-background (high ink fraction)
    pages = ok[~ok.media_ref.str.endswith(".mask")]
    # regular pages are >=600px; the corpus includes one small edge-case page
    assert (pages.width >= 600).sum() >= len(pages) - 1
    assert ((pages.ink_frac > 0) & (pages.ink_frac < 0.5)).all()


def test_image_features_malformed(ray_session):
    from dup_ocropy_ray.stages.multimodal import ImageFeatures

    b = pa.table({"media_ref": ["x"], "bytes": [b"not a png"]})
    out = ImageFeatures()(b)
    assert out.column("status")[0].as_py().startswith("decode_error")


def test_image_resize(ray_session, media_table):
    from dup_ocropy_ray.functions import png
    from dup_ocropy_ray.stages.multimodal import ImageResize

    ds = rd.read_parquet(media_table)
    out = ds.map_batches(ImageResize, fn_constructor_kwargs={"max_dim": 64},
                         batch_format="pyarrow", batch_size=2,
                         concurrency=1).to_pandas()
    for t in out.thumb_png:
        g = png.decode_gray(t)
        assert max(g.shape) <= 64


def test_audio_video_stubs(ray_session):
    from dup_ocropy_ray.stages.multimodal import AudioFeatures, VideoFrameSample

    b = pa.table({"media_ref": ["a"], "bytes": [bytes(range(256)) * 4]})
    with pytest.raises(NotImplementedError):
        AudioFeatures()(b)
    out = AudioFeatures(fake=True)(b)
    assert out.column("duration_s")[0].as_py() == pytest.approx(1024 / 16000)
    with pytest.raises(NotImplementedError):
        VideoFrameSample()(b)
    out = VideoFrameSample(num_frames=4, fake=True)(b)
    frames = out.column("frames")[0].as_py()
    assert len(frames) == 4 and all(len(f) == 256 for f in frames)


def test_image_dhash_and_dup_pairs(ray_session):
    """dHash is stable under re-encode, tolerant to small perturbation,
    and distinct images don't pair; decode failures get status rows and
    never enter the pair search. Also pins the hamming64 signed-int64
    fix (mixed-sign patterns count two's-complement bits)."""
    from dup_ocropy_ray.functions import png
    from dup_ocropy_ray.functions.hashing import hamming64
    from dup_ocropy_ray.pipelines.dedup import image_dup_pairs
    from dup_ocropy_ray.sources.glyphs import render_line
    from dup_ocropy_ray.stages.multimodal import ImageDHash

    assert hamming64(-1, 0) == 64
    assert hamming64(np.int64(-1), np.int64(-1)) == 0

    base = render_line("the quick brown fox")
    jitter = np.clip(base + 0.02, 0.0, 1.0)  # mild global brightness shift
    other = render_line("zzzz qqqq wwww mmmm")
    blobs = {
        "a": png.encode_gray(base),
        "a_copy": png.encode_gray(base),
        "a_jitter": png.encode_gray(jitter),
        "b": png.encode_gray(other),
        "broken": b"not a png",
    }
    t = pa.table({
        "media_ref": pa.array(list(blobs), pa.string()),
        "bytes": pa.array(list(blobs.values()), pa.binary()),
    })
    hashed = ImageDHash()(t).to_pandas()
    st = dict(zip(hashed.media_ref, hashed.status))
    assert st["a"] == "ok" and st["broken"].startswith("decode_error")
    hs = dict(zip(hashed.media_ref, hashed.dhash))
    assert hs["a"] == hs["a_copy"]

    pairs = image_dup_pairs(rd.from_arrow(t), max_hamming=3)
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert ("a", "a_copy") in got
    assert ("a", "a_jitter") in got or ("a_jitter", "a") in got
    assert not any("b" in pair for pair in got)       # distinct image
    assert not any("broken" in pair for pair in got)  # failed decode
