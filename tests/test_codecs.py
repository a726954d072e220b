import numpy as np
import pytest

from entity_deduplication_hack_main_ray.functions.codecs import (
    UnsupportedFormatError,
    decode_fake_jpeg,
    decode_image,
    decode_png,
    encode_fake_jpeg,
    encode_png,
    psnr,
)


def _img(shape=(48, 40, 3), seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_png_roundtrip_rgb():
    img = _img()
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_gray():
    img = _img((32, 32))
    assert np.array_equal(decode_png(encode_png(img)), img)


@pytest.mark.parametrize("quality,floor", [(95, 45.0), (85, 42.0), (70, 40.0)])
def test_fake_jpeg_psnr_floor(quality, floor):
    """The lossy stand-in must clear the 40 dB fidelity bar (BASELINE.md)."""
    img = _img()
    out = decode_fake_jpeg(encode_fake_jpeg(img, quality))
    assert psnr(img, out) >= floor


def test_fake_jpeg_deterministic():
    img = _img(seed=3)
    assert encode_fake_jpeg(img, 85) == encode_fake_jpeg(img, 85)


def test_decode_dispatch_and_stub_gate():
    img = _img((16, 16))
    assert np.array_equal(decode_image(encode_png(img), "png"), img)
    with pytest.raises(UnsupportedFormatError):
        decode_image(b"xxxx", "webp")  # no decoder in this environment


def test_psnr_identical_is_inf():
    img = _img()
    assert psnr(img, img) == float("inf")


def test_real_jpeg_gate_without_pil():
    """VERDICT r4 #5: a REAL JFIF payload (SOI marker) must hit the explicit
    UnsupportedFormatError gate when PIL/libjpeg is absent — never be
    mis-parsed by the FakeJpeg stand-in."""
    from entity_deduplication_hack_main_ray.functions import codecs

    if codecs.HAVE_PIL:
        pytest.skip("PIL present: the gate path does not apply")
    real_jpeg_prefix = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + b"\x00" * 32
    with pytest.raises(codecs.UnsupportedFormatError):
        decode_image(real_jpeg_prefix, "jpeg")


def test_real_jpeg_decode_with_pil():
    """Auto-skips unless PIL exists (production images): real JPEG
    round-trips through PIL/libjpeg via the same decode_image entry."""
    PIL = pytest.importorskip("PIL")
    import io

    from entity_deduplication_hack_main_ray.functions import codecs

    img = (np.arange(24 * 24 * 3) % 251).astype(np.uint8).reshape(24, 24, 3)
    buf = io.BytesIO()
    PIL.Image.fromarray(img).save(buf, format="JPEG", quality=95)
    out = decode_image(buf.getvalue(), "jpeg")
    assert out.shape == img.shape
    assert codecs.psnr(img, out) >= 30.0
