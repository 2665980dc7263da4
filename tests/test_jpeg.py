"""Baseline JPEG codec (operators/jpeg.py) — roundtrip fidelity,
marker-walk robustness, scope enforcement, and the multimodal
dispatch integration (VERDICT r7 item 7)."""

import struct

import numpy as np
import pytest

from industrial_data_pipeline_spark.operators.jpeg import (
    jpeg_decode, jpeg_encode)
from industrial_data_pipeline_spark.operators.multimodal import (
    decode_image, jfif_encode_header, probe_image, resize_nearest)


def _gradient_rgb(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 7) % 256, (y * 5) % 256,
                     ((x + y) * 3) % 256], axis=-1).astype(np.uint8)


def test_rgb_roundtrip_close():
    """Smooth content at q90 survives quantization within a few
    levels per channel — the standard-tables fidelity bound."""
    px = _gradient_rgb(24, 33)  # non-multiple-of-8 dims on purpose
    w, h, c, dec = jpeg_decode(jpeg_encode(px, quality=90))
    assert (w, h, c) == (33, 24, 3)
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 6


def test_gray_roundtrip_and_flat_exact():
    rng = np.random.RandomState(7)
    g = rng.randint(0, 256, (17, 19), dtype=np.uint8)
    w, h, c, dec = jpeg_decode(jpeg_encode(g, quality=95))
    assert (w, h, c) == (19, 17, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 16
    flat = np.full((8, 8, 3), 128, dtype=np.uint8)
    _w, _h, _c, dflat = jpeg_decode(jpeg_encode(flat, quality=50))
    assert np.array_equal(dflat, flat)  # DC-only block is lossless


def test_quality_monotonic_size():
    px = _gradient_rgb(32, 32)
    sizes = [len(jpeg_encode(px, quality=q)) for q in (25, 75, 95)]
    assert sizes == sorted(sizes)


def test_probe_and_dispatch_agree():
    px = _gradient_rgb(16, 40)
    enc = jpeg_encode(px)
    assert probe_image(enc) == ("jpeg", 40, 16)
    w, h, c, dec = decode_image(enc)
    assert (w, h, c) == (40, 16, 3) and dec.shape == (16, 40, 3)


def test_decoder_walks_com_and_fill_bytes():
    """Extra COM segment + fill bytes before a marker must not
    derail the segment walk (the probe_image surface, now for
    pixels)."""
    enc = bytearray(jpeg_encode(_gradient_rgb(8, 8)))
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"extra"
    out = bytes(enc[:2]) + b"\xff\xff" + com + bytes(enc[2:])
    w, h, c, _px = jpeg_decode(out)
    assert (w, h, c) == (8, 8, 3)


def test_progressive_and_bad_input_raise():
    enc = bytearray(jpeg_encode(_gradient_rgb(8, 8)))
    sof0 = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:sof0]) + b"\xff\xc2" + bytes(enc[sof0 + 2:])
    with pytest.raises(NotImplementedError, match="SOF2"):
        jpeg_decode(prog)
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01\x02")
    # a JFIF prelude (no SOS/entropy stream) is metadata-only:
    # probe succeeds, pixel decode refuses
    prelude = jfif_encode_header(20, 10)
    assert probe_image(prelude) == ("jpeg", 20, 10)
    with pytest.raises(ValueError):
        jpeg_decode(prelude)
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4, 2), dtype=np.uint8))


def test_resize_jpeg_pixels_match_reference():
    """decode → nearest resize → re-encode → decode lands within the
    second encode's quantization error of the reference resample."""
    px = _gradient_rgb(24, 24)
    enc = jpeg_encode(px, quality=90)
    _w, _h, _c, dec = jpeg_decode(enc)
    ref = resize_nearest(dec, 12, 12)
    _w2, _h2, _c2, dec2 = jpeg_decode(jpeg_encode(ref, quality=90))
    assert dec2.shape == (12, 12, 3)
    assert np.abs(dec2.astype(int) - ref.astype(int)).max() <= 8


def test_420_subsampled_roundtrip():
    """4:2:0 encode exercises the decoder's sampling-factor MCU walk
    and chroma upsample: smooth content survives within the combined
    quantization + subsample bound; dims exact on non-multiples of
    16."""
    px = _gradient_rgb(24, 33)
    enc = jpeg_encode(px, quality=90, subsample=True)
    w, h, c, dec = jpeg_decode(enc)
    assert (w, h, c) == (33, 24, 3)
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 12


def test_restart_markers_decode_identically():
    """Restart intervals repackage the SAME quantized coefficients
    (DC predictors reset at each RSTn) — decoded pixels must be
    byte-identical to the non-restart stream, proving the decoder's
    segment split + predictor reset, in gray, 4:4:4 and 4:2:0."""
    px = _gradient_rgb(24, 33)
    base = jpeg_decode(jpeg_encode(px, quality=90))[3]
    for kwargs in ({"restart_interval": 1}, {"restart_interval": 2},
                   {"restart_interval": 7}):
        enc = jpeg_encode(px, quality=90, **kwargs)
        assert b"\xff\xdd" in enc  # DRI present
        assert np.array_equal(jpeg_decode(enc)[3], base)
    b420 = jpeg_decode(jpeg_encode(px, quality=90, subsample=True))[3]
    enc = jpeg_encode(px, quality=90, subsample=True,
                      restart_interval=1)
    assert np.array_equal(jpeg_decode(enc)[3], b420)
    g = (np.arange(40 * 25).reshape(25, 40) % 256).astype(np.uint8)
    gb = jpeg_decode(jpeg_encode(g, quality=92))[3]
    assert np.array_equal(
        jpeg_decode(jpeg_encode(g, quality=92, restart_interval=3))[3],
        gb)
