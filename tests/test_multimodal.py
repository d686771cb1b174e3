"""Multimodal plumbing tests (SURVEY.md §2.11 E3): the mapInPandas stages'
schemas, batch shapes, and 1→N expansion — the parts that stay when the
deterministic fakes are swapped for real codecs."""

from __future__ import annotations

import pytest

from changesetmd_spark.operators.multimodal import (
    decode_media,
    real_decode_stub,
    resize_media,
    sample_frames,
    synthesize_media,
)


def test_decode_schema_and_determinism(spark, sf_dir):
    media = synthesize_media(spark, sf_dir).limit(20)
    d1 = {r.media_id: r.feature_hash for r in decode_media(media).collect()}
    d2 = {r.media_id: r.feature_hash for r in decode_media(media).collect()}
    assert d1 == d2 and len(d1) == 20


def test_resize_exact_output_size(spark, sf_dir):
    media = synthesize_media(spark, sf_dir).limit(5)
    rows = resize_media(media, target_w=16, target_h=8).collect()
    assert all(len(r.payload) == 16 * 8 for r in rows)
    assert all(r.width == 16 and r.height == 8 for r in rows)


def test_sample_frames_expands_rows(spark, sf_dir):
    media = synthesize_media(spark, sf_dir).limit(5)
    frames = sample_frames(media, every_k=1, frame_bytes=64).collect()
    n_in = media.count()
    assert len(frames) > n_in  # 1 -> N expansion
    assert all(r.frame_idx >= 0 and len(r.frame) <= 64 for r in frames)


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode_stub(b"x", "image/png")


def test_codec_capability_probe_and_gating(spark, sf_dir):
    """The capability probe must gate both the real_decode plug-point and
    the conditional q_multimodal_decode_real registration: in an
    environment without PIL the query is absent and real_decode raises the
    documented NotImplementedError; with PIL it decodes a real PNG and the
    registered query runs end-to-end."""
    import pytest

    from changesetmd_spark import registry
    from changesetmd_spark.operators.multimodal import (
        codec_capabilities,
        real_decode,
    )

    caps = codec_capabilities()
    assert set(caps) == {"ppm", "image", "video"}
    assert caps["ppm"]  # pure-Python codec: available everywhere
    if not caps["image"]:
        assert "q_multimodal_decode_real" not in registry.queries()
        with pytest.raises(NotImplementedError):
            real_decode(b"\x89PNG", "image/png")
        pytest.skip("PIL not installed here: gated path verified, "
                    "decode path exercised where the environment allows")
    import base64

    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAAAAAA6fptVAAAACklEQVR4nGP6"
        "DwABBQECz6AuzQAAAABJRU5ErkJggg=="
    )
    w, h, n_frames, feature = real_decode(png, "image/png")
    assert (w, h, n_frames) == (1, 1, 1)
    rows = registry.queries()["q_multimodal_decode_real"](
        spark, sf_dir
    ).collect()
    assert rows and all(r.max_width == 1 for r in rows)


def test_ppm_codec_round_trip():
    """The dependency-free P6 codec must round-trip exactly, including a
    planted header comment (the parse path q_multimodal_decode relies on)."""
    from changesetmd_spark.operators.multimodal import (
        decode_ppm_p6,
        encode_ppm_p6,
    )

    pixels = bytes((7 + i) % 256 for i in range(3 * 5 * 4))
    for comment in (None, "fixture 42"):
        payload = encode_ppm_p6(5, 4, pixels, comment=comment)
        w, h, maxval, out = decode_ppm_p6(payload)
        assert (w, h, maxval) == (5, 4, 255)
        assert out == pixels


def test_ppm_codec_rejects_malformed():
    from changesetmd_spark.operators.multimodal import (
        decode_ppm_p6,
        encode_ppm_p6,
    )

    with pytest.raises(ValueError):
        decode_ppm_p6(b"P5\n1 1\n255\n\x00")  # wrong magic
    with pytest.raises(ValueError):
        decode_ppm_p6(b"P6\n2 2\n255\n\x00\x00")  # truncated raster
    with pytest.raises(ValueError):
        encode_ppm_p6(2, 2, b"\x00")  # wrong pixel count at encode


def test_ppm_real_decode_default_codec():
    """real_decode handles PPM in EVERY environment (the default codec
    path); only non-PPM formats fall through to the library probe."""
    from changesetmd_spark.operators.multimodal import (
        PPM_MIME,
        encode_ppm_p6,
        real_decode,
    )

    pixels = bytes(range(3 * 2 * 1))
    w, h, n_frames, feature = real_decode(
        encode_ppm_p6(2, 1, pixels), PPM_MIME
    )
    assert (w, h, n_frames) == (2, 1, 1)
    assert isinstance(feature, int)


def test_ppm_decode_query_nonempty_and_planted_comments(spark, sf_dir):
    """q_multimodal_decode must decode every document's image (non-vacuous)
    and the fixture must actually plant comment headers (else the parse
    test is weaker than advertised)."""
    from changesetmd_spark import registry
    from changesetmd_spark.operators.multimodal import synthesize_ppm_media

    out = {
        r.modality: r.n_items
        for r in registry.queries()["q_multimodal_decode"](
            spark, sf_dir
        ).collect()
    }
    assert sum(out.values()) > 0
    media = synthesize_ppm_media(spark, sf_dir).limit(40).collect()
    assert any(b"#" in bytes(r.payload)[:32] for r in media)
    assert any(b"#" not in bytes(r.payload)[:32] for r in media)


def test_ppm_resize_real_pixel_math(spark, sf_dir):
    """resize_ppm_media must apply the genuine nearest-neighbor rule: on a
    hand-built 4x2 raster resized to 2x1 the output pixels are exactly the
    source pixels at (0,0) and (0,2), and every output payload is itself a
    valid PPM of the target size."""
    import numpy as np

    from changesetmd_spark.operators.multimodal import (
        PPM_MIME,
        decode_ppm_p6,
        encode_ppm_p6,
        resize_ppm_media,
    )

    src = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm_p6(4, 2, src.tobytes())), PPM_MIME, 0)],
        "media_id long, modality string, payload binary, "
        "mime_type string, n_bytes long",
    )
    row = resize_ppm_media(df, tw=2, th=1).collect()[0]
    w, h, _mx, pixels = decode_ppm_p6(bytes(row.payload))
    assert (w, h) == (2, 1)
    out = np.frombuffer(pixels, dtype=np.uint8).reshape(1, 2, 3)
    # ty=0 -> sy = 0*2//1 = 0; tx=0 -> sx=0, tx=1 -> sx = 1*4//2 = 2
    assert (out[0, 0] == src[0, 0]).all()
    assert (out[0, 1] == src[0, 2]).all()
    assert row.pixel_sum == int(out.sum())
