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
    # non-WAV audio without fake: skip-don't-fail status row (PCM WAV
    # itself decodes for real — see test_audio_stage_real_wav_and_skip_paths)
    out = AudioFeatures()(b)
    assert out.column("audio_status")[0].as_py().startswith("unsupported")
    out = AudioFeatures(fake=True)(b)
    assert out.column("duration_s")[0].as_py() == pytest.approx(1024 / 16000)
    assert out.column("audio_status")[0].as_py() == "fake"
    # non-AVI video without fake: skip-don't-fail status row (raw-DIB
    # AVI decodes for real — see test_video_stage_real_avi)
    out = VideoFrameSample()(b)
    assert out.column("video_status")[0].as_py().startswith("unsupported")
    out = VideoFrameSample(num_frames=4, fake=True)(b)
    frames = out.column("frames")[0].as_py()
    assert len(frames) == 4 and all(len(f) == 256 for f in frames)
    assert out.column("video_status")[0].as_py() == "fake"


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


# ------------------------------------------------------------ real WAV


def test_wav_roundtrip_and_features():
    import numpy as np

    from dup_ocropy_ray.functions.wav import (
        decode_wav,
        encode_wav,
        wav_features,
    )

    rate = 16000
    t = np.arange(rate * 2) / rate
    sine = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    data = encode_wav(sine, rate)
    x, r = decode_wav(data)
    assert r == rate and x.shape == (rate * 2, 1)
    assert abs(float(np.max(x)) - 0.5) < 1e-3
    f = wav_features(data)
    assert abs(f["duration_s"] - 2.0) < 1e-6
    assert abs(f["dominant_hz"] - 440.0) < 1.0
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(f["zcr_per_s"] - 2 * 440.0) < 5.0

    # stereo + 8-bit paths
    stereo = np.stack([sine, -sine], axis=1)
    x2, _ = decode_wav(encode_wav(stereo, rate))
    assert x2.shape == (rate * 2, 2)


def test_audio_stage_real_wav_and_skip_paths(ray_session):
    import numpy as np
    import pyarrow as pa

    from dup_ocropy_ray.functions.wav import encode_wav
    from dup_ocropy_ray.stages.multimodal import AudioFeatures

    rate = 8000
    t = np.arange(rate) / rate
    wav = encode_wav(0.3 * np.sin(2 * np.pi * 100.0 * t), rate)
    batch = pa.table({
        "media_ref": ["a", "b", "c"],
        "bytes": pa.array([wav, b"\x00garbage", b"RIFFxxxxWAVE"],
                          pa.binary()),
    })
    out = AudioFeatures()(batch)
    st = out.column("audio_status").to_pylist()
    assert st[0] == "ok"
    assert st[1].startswith("unsupported")
    assert st[2].startswith("decode_error")
    assert abs(out.column("dominant_hz")[0].as_py() - 100.0) < 1.0


def test_avi_roundtrip_pixel_exact():
    import numpy as np

    from dup_ocropy_ray.functions.avi import decode_avi, encode_avi

    rng = np.random.default_rng(4)
    for shape in [(5, 7, 13), (3, 8, 8, 3)]:  # odd width = padded rows
        f = rng.integers(0, 256, shape).astype(np.uint8)
        out, fps = decode_avi(encode_avi(f, fps=12))
        want = np.repeat(f[..., None], 3, axis=3) if f.ndim == 3 else f
        assert fps == 12 and out.shape == want.shape
        assert (out == want).all()


def test_video_stage_real_avi(ray_session):
    import numpy as np
    import pyarrow as pa

    from dup_ocropy_ray.functions import png as _png
    from dup_ocropy_ray.functions.avi import encode_avi
    from dup_ocropy_ray.stages.multimodal import VideoFrameSample

    y, x = np.mgrid[0:12, 0:16]
    frames = np.stack([(x + y + 9 * f) % 256 for f in range(6)]).astype(
        np.uint8)
    avi = encode_avi(frames, fps=8)
    batch = pa.table({"media_ref": ["v"],
                      "bytes": pa.array([avi], pa.binary())})
    out = VideoFrameSample(num_frames=3)(batch)
    assert out.column("video_status")[0].as_py() == "ok"
    assert out.column("n_frames_total")[0].as_py() == 6
    assert out.column("fps")[0].as_py() == 8
    thumbs = out.column("frames")[0].as_py()
    assert len(thumbs) == 3
    # sampled indices 0,2,4: thumbnail pixels equal the source frames
    for k, i in enumerate((0, 2, 4)):
        g = _png.decode_gray(thumbs[k])
        want = frames[i].astype(np.float64) / 255.0
        assert np.abs(g - want).max() < 1 / 255.0
