"""Baseline JPEG codec: the decoder must reproduce the encoder's
mathematical reconstruction BYTE-EXACTLY (JPEG is lossy — the quantized
coefficients pushed back through IDCT/upsample/color-convert are the
ground truth, not the encoder's input)."""

import random

import pytest

from readability_php_spark.operators.jpeg import (
    JpegPixelsUnavailable,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_with_recon,
)


def test_solid_gray_exact_value():
    # DC quant step 8 makes solid blocks lossless: decoded == input value,
    # including non-multiple-of-8 dims (MCU padding cropped away)
    for v, w, h in [(200, 9, 7), (0, 16, 16), (255, 13, 5), (77, 8, 8), (128, 1, 1)]:
        payload, recon = encode_jpeg_with_recon(w, h, bytes([v]) * (w * h), channels=1)
        W, H, px = decode_jpeg(payload)
        assert (W, H) == (w, h)
        assert px == recon
        assert set(px) == {v}


def test_random_gray_roundtrip_exact():
    rng = random.Random(42)
    w, h = 21, 18
    pix = bytes(rng.randrange(256) for _ in range(w * h))
    payload, recon = encode_jpeg_with_recon(w, h, pix, channels=1)
    assert decode_jpeg(payload) == (w, h, recon)


def test_rgb_444_roundtrip_exact():
    rng = random.Random(7)
    w, h = 12, 10
    pix = bytes(rng.randrange(256) for _ in range(w * h * 3))
    payload, recon = encode_jpeg_with_recon(w, h, pix, channels=3)
    assert decode_jpeg(payload) == (w, h, recon)


def test_rgb_420_subsampled_roundtrip_exact():
    # 4:2:0 exercises multi-block MCUs (4 luma blocks per MCU) and the
    # chroma upsample path, at odd dimensions
    rng = random.Random(13)
    w, h = 19, 13
    pix = bytes(rng.randrange(256) for _ in range(w * h * 3))
    payload, recon = encode_jpeg_with_recon(
        w, h, pix, channels=3, subsampling=(2, 2)
    )
    assert decode_jpeg(payload) == (w, h, recon)


def test_restart_markers_roundtrip():
    rng = random.Random(99)
    w, h = 40, 24
    pix = bytes(rng.randrange(256) for _ in range(w * h))
    payload, recon = encode_jpeg_with_recon(
        w, h, pix, channels=1, restart_interval=2
    )
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
    assert decode_jpeg(payload) == (w, h, recon)


def test_unsupported_streams_flag_pixels_unavailable():
    payload = encode_jpeg(16, 16, bytes(256), channels=1)
    # arithmetic-coded (SOF9): honestly unsupported
    i = payload.index(b"\xff\xc0")
    with pytest.raises(JpegPixelsUnavailable):
        decode_jpeg(payload[:i] + b"\xff\xc9" + payload[i + 2 :])
    # header-only (no SOS): dims parse elsewhere, pixels honestly absent
    sos = payload.index(b"\xff\xda")
    with pytest.raises(JpegPixelsUnavailable):
        decode_jpeg(payload[:sos] + b"\xff\xd9")
    # a SOF0 stream relabeled SOF2 is now a MALFORMED progressive scan
    # (baseline SOS claims the full 0..63 band as one interleaved scan),
    # not an unsupported feature
    with pytest.raises(ValueError):
        decode_jpeg(payload[:i] + b"\xff\xc2" + payload[i + 2 :])


def test_corrupt_streams_raise_valueerror():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff" + b" jpeg-ish garbage")
    # truncated entropy data: structurally starts fine, runs dry mid-MCU
    payload = encode_jpeg(24, 24, bytes(range(256)) * 2 + bytes(64), channels=1)
    sos = payload.index(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(payload[: sos + 20] + b"\xff\xd9")


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 26),
        h=st.integers(1, 22),
        channels=st.sampled_from([1, 3, 3]),
        sub=st.sampled_from([(1, 1), (2, 1), (2, 2)]),
        ri=st.sampled_from([0, 0, 1, 3]),
        seed=st.integers(0, 2**31),
    )
    def test_fuzz_roundtrip_decoder_matches_recon(w, h, channels, sub, ri, seed):
        """For ANY image/sampling/restart combination the decoder must
        reproduce the encoder's reconstruction byte-exactly."""
        rng = random.Random(seed)
        pix = bytes(rng.randrange(256) for _ in range(w * h * channels))
        payload, recon = encode_jpeg_with_recon(
            w, h, pix,
            channels=channels,
            subsampling=sub if channels == 3 else (1, 1),
            restart_interval=ri,
        )
        assert decode_jpeg(payload) == (w, h, recon)


def test_media_features_jpeg_real_path(spark):
    """extract_media_features(fake_decode=False) decodes a full baseline
    JPEG for real: dims + exact pixel_sum, error None."""
    from readability_php_spark.operators.multimodal import extract_media_features

    v, w, h = 190, 11, 9
    payload = encode_jpeg(w, h, bytes([v]) * (w * h), channels=1)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, kind string, payload binary",
    )
    row = extract_media_features(media, fake_decode=False).collect()[0]
    assert (row.width, row.height, row.error) == (w, h, None)
    assert row.pixel_sum == v * w * h


# ---------------------------------------------------------------------------
# progressive (SOF2, T.81 §G)
# ---------------------------------------------------------------------------

from readability_php_spark.operators.jpeg import (  # noqa: E402
    encode_progressive_jpeg_with_recon,
)


def test_progressive_solid_gray_exact_value():
    for v, w, h in [(200, 9, 7), (0, 16, 16), (255, 13, 5), (128, 1, 1)]:
        payload, recon = encode_progressive_jpeg_with_recon(
            w, h, bytes([v]) * (w * h), channels=1
        )
        assert b"\xff\xc2" in payload  # really SOF2
        W, H, px = decode_jpeg(payload)
        assert (W, H) == (w, h)
        assert px == recon
        assert set(px) == {v}


def test_progressive_matches_baseline_decode():
    """Baseline and progressive encodings of one image carry the SAME
    quantized coefficients — their decodes must agree byte-for-byte
    (the cross-codec oracle)."""
    rng = random.Random(5)
    for w, h, channels, sub in [
        (21, 18, 1, (1, 1)),
        (12, 10, 3, (1, 1)),
        (19, 13, 3, (2, 2)),   # padded luma blocks exist: 4:2:0 odd dims
        (17, 9, 3, (2, 1)),
    ]:
        pix = bytes(rng.randrange(256) for _ in range(w * h * channels))
        bp, brec = encode_jpeg_with_recon(
            w, h, pix, channels=channels, subsampling=sub
        )
        pp, prec = encode_progressive_jpeg_with_recon(
            w, h, pix, channels=channels, subsampling=sub
        )
        assert prec == brec
        assert decode_jpeg(pp) == (w, h, prec)
        assert decode_jpeg(bp) == (w, h, brec)


def test_progressive_restart_markers_roundtrip():
    rng = random.Random(17)
    w, h = 40, 24
    pix = bytes(rng.randrange(256) for _ in range(w * h))
    payload, recon = encode_progressive_jpeg_with_recon(
        w, h, pix, channels=1, restart_interval=2
    )
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
    assert decode_jpeg(payload) == (w, h, recon)


def test_progressive_truncated_scan_raises():
    payload, _ = encode_progressive_jpeg_with_recon(
        24, 24, bytes(range(256)) * 2 + bytes(64), channels=1
    )
    sos = payload.index(b"\xff\xda")
    with pytest.raises((ValueError, JpegPixelsUnavailable)):
        decode_jpeg(payload[: sos + 12] + b"\xff\xd9")


if _HAVE_HYP:

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        w=st.integers(1, 26),
        h=st.integers(1, 22),
        channels=st.sampled_from([1, 3, 3]),
        sub=st.sampled_from([(1, 1), (2, 1), (2, 2)]),
        ri=st.sampled_from([0, 0, 1, 3]),
        seed=st.integers(0, 2**31),
    )
    def test_fuzz_progressive_roundtrip(w, h, channels, sub, ri, seed):
        """For ANY image/sampling/restart combination the progressive
        decode must reproduce the progressive encoder's reconstruction
        byte-exactly AND equal the baseline encoding's reconstruction
        of the same input (identical quantized coefficients)."""
        rng = random.Random(seed)
        pix = bytes(rng.randrange(256) for _ in range(w * h * channels))
        sub = sub if channels == 3 else (1, 1)
        payload, recon = encode_progressive_jpeg_with_recon(
            w, h, pix, channels=channels, subsampling=sub,
            restart_interval=ri,
        )
        assert decode_jpeg(payload) == (w, h, recon)
        _, brec = encode_jpeg_with_recon(
            w, h, pix, channels=channels, subsampling=sub
        )
        assert recon == brec


def test_decode_image_dispatches_progressive():
    """The multimodal decode front door now decodes SOF2 streams for
    real (it used to fall back to decoder_unavailable)."""
    from readability_php_spark.operators.multimodal import decode_image

    v, w, h = 190, 11, 9
    payload, recon = encode_progressive_jpeg_with_recon(
        w, h, bytes([v]) * (w * h), channels=1
    )
    assert decode_image(payload) == (w, h, recon)
