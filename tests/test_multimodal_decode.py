"""Stdlib image decode (ops/multimodal.decode_image): PPM P6/P3 and
24-bit BMP round-trips, row-order/channel-order/padding correctness,
and the NotImplementedError contract narrowing to codec formats only."""

from __future__ import annotations

import numpy as np
import pytest

from crawl4ai_spark.ops.multimodal import (
    decode_image,
    decode_real,
    encode_bmp,
    encode_ppm,
    fake_features,
    image_features,
    planted_pixels,
)


def test_ppm_p6_roundtrip():
    px = planted_pixels(5, 7, 4)
    assert (decode_image(encode_ppm(px)) == px).all()


def test_ppm_p3_roundtrip_and_comment():
    px = planted_pixels(9, 3, 3)
    assert (decode_image(encode_ppm(px, ascii_p3=True)) == px).all()
    blob = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    assert decode_image(blob).tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_bmp_roundtrip_covers_flip_bgr_padding():
    # w=3 -> 9-byte rows pad to 12; bottom-up + BGR must be undone
    px = planted_pixels(2, 3, 5)
    assert (decode_image(encode_bmp(px)) == px).all()
    assert (decode_image(encode_bmp(planted_pixels(2, 4, 2)))
            == planted_pixels(2, 4, 2)).all()  # no-padding width too


def test_decode_real_contract():
    px = planted_pixels(1, 2, 2)
    assert (decode_real(encode_ppm(px), "image") == px).all()
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG\r\n", "image")  # compressed: still stubbed
    with pytest.raises(NotImplementedError):
        decode_real(encode_ppm(px), "audio")


def test_image_features_order_sensitivity():
    px = planted_pixels(3, 4, 3)
    f_ppm = image_features(encode_ppm(px), "image")
    f_bmp = image_features(encode_bmp(px), "image")
    assert f_ppm == f_bmp  # container-independent
    assert f_ppm[0] == 4.0 and f_ppm[1] == 3.0 and f_ppm[2] == 12.0
    assert f_ppm[13] == float(px[0, 0, 0])  # first_r (top-left, R)
    assert f_ppm[14] == float(px[-1, -1, 2])  # last_b (bottom-right, B)
    # a vertically-flipped image must differ on the order-sensitive slots
    flipped = px[::-1].copy()
    f_flip = image_features(encode_ppm(flipped), "image")
    assert f_flip[3:6] == f_ppm[3:6]  # means invariant
    assert f_flip[13] != f_ppm[13] or f_flip[14] != f_ppm[14]


def test_fake_features_still_available():
    assert len(fake_features(b"abc", "image")) == 16
