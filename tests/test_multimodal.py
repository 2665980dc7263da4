"""Multimodal plumbing: schema, Arrow batching, stub + real kernels."""

import struct
import zlib

import numpy as np
import pytest

from industrial_data_pipeline_spark.operators import multimodal as MM


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfake", 640, 480, None, None),
        (2, "video", b"\x00vid", None, None, 3500, None),
        (3, "audio", b"RIFFfake", None, None, 2000, 44100),
        (4, "image", None, None, None, None, None),   # NULL payload
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_feature_extraction_shape_and_determinism(media):
    out = MM.extract_features(media).collect()
    by_id = {r.media_id: r for r in out}
    assert set(by_id) == {1, 2, 3, 4}
    assert len(by_id[1].feature) == MM.FEATURE_DIM
    assert all(0 <= x < 1 for x in by_id[1].feature)
    assert by_id[4].feature is None  # NULL payload propagates
    # deterministic across runs
    again = {r.media_id: r.feature for r in
             MM.extract_features(media).collect()}
    assert again[1] == by_id[1].feature


def test_frame_sampling_expansion(media):
    frames = MM.sample_frames(media, every_ms=1000).collect()
    assert {f.media_id for f in frames} == {2}  # only the video row
    assert [f.frame_idx for f in frames] == [0, 1, 2, 3]  # 3500ms/1000
    assert [f.frame_ms for f in frames] == [0, 1000, 2000, 3000]
    assert len({f.frame_hash for f in frames}) == 4  # distinct per frame


def test_resize_updates_metadata_only(media):
    out = MM.resize_images(media, 128, 128).collect()
    assert all(r.kind == "image" for r in out)
    assert all(r.width == 128 and r.height == 128 for r in out)


def test_real_frame_sampling_raises_not_implemented(media):
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        MM.sample_frames(media, decode_stub=False).collect()


# --------------------------------------------------- real image kernels


def _checker(w, h, c):
    """Deterministic test image: (x + 2y + chan) % 256."""
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    ch = np.arange(c)[None, None, :]
    return ((x + 2 * y + ch) % 256).astype(np.uint8)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip_all_channel_counts(c):
    px = _checker(23, 11, c)
    payload = MM.png_encode(px)
    assert MM.probe_image(payload) == ("png", 23, 11)
    w, h, cc, out = MM.png_decode(payload)
    assert (w, h, cc) == (23, 11, c)
    assert np.array_equal(out, px)


def test_png_decode_all_filter_types():
    """Hand-filter scanlines with filters 0..4 and check the decoder
    inverts each (our encoder only emits filter 0, so this is the
    only coverage of Sub/Up/Average/Paeth)."""
    px = _checker(7, 5, 3)
    stride = 7 * 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else b if pb <= pc else c

    raw = bytearray()
    prev = [0] * stride
    for y in range(5):
        line = list(px[y].reshape(-1))
        f = y % 5
        raw.append(f)
        filt = []
        for x in range(stride):
            left = line[x - 3] if x >= 3 else 0
            up = prev[x]
            ul = prev[x - 3] if x >= 3 else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: paeth(left, up, ul)}[f]
            filt.append((line[x] - pred) & 0xFF)
        raw.extend(filt)
        prev = line
    ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d \
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    w, h, c, out = MM.png_decode(payload)
    assert (w, h, c) == (7, 5, 3)
    assert np.array_equal(out, px)


def test_probe_jpeg_and_gif_headers():
    jpeg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 2)
    assert MM.probe_image(jpeg) == ("jpeg", 640, 480)
    gif = b"GIF87a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert MM.probe_image(gif) == ("gif", 320, 200)
    assert MM.probe_image(b"plain text") is None
    assert MM.probe_image(None) is None


def test_probe_jpeg_fill_bytes_and_sos_stop():
    # ITU T.81 allows repeated 0xFF fill bytes before a marker; the
    # walker must skip them, find the SOF, and never walk past SOS
    sof = (b"\xff\xff\xff\xc0" + struct.pack(">H", 11) + b"\x08"
           + struct.pack(">HH", 33, 44) + b"\x03" + b"\x00" * 2)
    sos_garbage = b"\xff\xda" + struct.pack(">H", 4) + b"\x99" * 40
    assert MM.probe_image(b"\xff\xd8" + sof + sos_garbage) \
        == ("jpeg", 44, 33)
    # dims AFTER SOS are unreachable by construction → unrecognized
    assert MM.probe_image(b"\xff\xd8" + sos_garbage + sof) is None


def test_real_features_survive_corrupt_png(spark):
    # valid signature + IHDR tag but truncated/corrupt payload must
    # fall back to byte statistics, not kill the Spark task
    truncated = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + b"\x01"
    good = MM.png_encode(_checker(4, 4, 3))
    bad_idat = good[:-30] + b"\x00" * 30  # corrupt IDAT + CRC area
    rows = [(1, "image", truncated, None, None, None, None),
            (2, "image", bad_idat, None, None, None, None)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    by_id = {r.media_id: r.feature for r in
             MM.extract_features(df, decode_stub=False).collect()}
    assert len(by_id) == 2
    assert all(f is not None and len(f) == MM.FEATURE_DIM
               for f in by_id.values())


def test_real_resize_actual_pixels(spark):
    px = _checker(20, 10, 3)
    rows = [(1, "image", bytearray(MM.png_encode(px)),
             20, 10, None, None)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = MM.resize_images(df, 5, 4, decode_stub=False).collect()
    assert len(out) == 1
    w, h, c, got = MM.png_decode(bytes(out[0].data))
    assert (w, h, c) == (5, 4, 3)
    assert (out[0].width, out[0].height) == (5, 4)
    assert np.array_equal(got, MM.resize_nearest(px, 5, 4))


def test_real_resize_rejects_non_png(spark):
    rows = [(1, "image", b"\xff\xd8not-really", 2, 2, None, None)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|PNG only|libjpeg|unrecognized"):
        MM.resize_images(df, 5, 4, decode_stub=False).collect()


def test_real_features_png_and_fallback(spark):
    px = _checker(8, 8, 1)
    rows = [
        (1, "image", bytearray(MM.png_encode(px)), 8, 8, None, None),
        (2, "audio", b"RIFFfake", None, None, 2000, 44100),
        (3, "image", None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    by_id = {r.media_id: r.feature for r in
             MM.extract_features(df, decode_stub=False).collect()}
    assert by_id[1][:3] == [8.0, 8.0, 1.0]      # real decoded dims
    assert by_id[1][7] == 1.0                   # aspect
    exp = px.astype(np.float64)
    assert by_id[1][3] == pytest.approx(exp.mean() / 255.0)
    assert by_id[2][0] == 0.0                   # not an image: byte stats
    assert 0.0 <= by_id[2][3] <= 1.0
    assert by_id[3] is None                     # NULL propagates


def test_phash_robust_to_noise_and_blocking_complete(spark):
    """pHash must be invariant-ish under mild pixel noise and far
    from unrelated images; the n_blocks pigeonhole join must find
    every pair within its guarantee band."""
    import numpy as np
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    noisy = np.clip(base.astype(np.int16) + rng.integers(
        -2, 3, base.shape), 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    h_base = MM.phash64_array(base)
    h_noisy = MM.phash64_array(noisy)
    h_other = MM.phash64_array(other)
    assert bin(h_base ^ h_noisy).count("1") <= 6
    assert bin(h_base ^ h_other).count("1") > 12
    # blocking completeness: a planted hash pair at EXACTLY Hamming 7
    # must be found with n_blocks=8 (guarantee <= 7)
    a = 0x0123456789ABCDEF
    b = a ^ 0b1111111  # 7 low bits differ
    rows = [(1, a), (2, b), (3, h_other)]
    df = spark.createDataFrame(rows, "media_id long, phash long")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in MM.phash_pairs(df, max_hamming=7,
                                     n_blocks=8).collect()}
    assert pairs.get((1, 2)) == 7


def test_wav_roundtrip_and_audio_features(spark):
    """PCM16 WAV round-trip (mono + stereo, odd data length padding)
    and real feature math on a known sine."""
    rate = 8000
    t = np.arange(rate)
    tone = (8000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    payload = MM.wav_encode(tone, rate)
    r, ch, arr = MM.wav_decode(payload)
    assert (r, ch) == (rate, 1)
    assert np.array_equal(arr[:, 0], tone)
    stereo = np.stack([tone, -tone], axis=1)
    r2, ch2, arr2 = MM.wav_decode(MM.wav_encode(stereo, rate))
    assert (r2, ch2) == (rate, 2)
    assert np.array_equal(arr2, stereo)

    rows = [(1, "audio", payload, None, None, None, rate)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    feat = MM.extract_audio_features(df).collect()[0]
    assert feat.sample_rate == rate
    assert feat.duration_ms == 1000
    assert abs(feat.dominant_freq_hz - 440.0) < 0.5
    assert abs(feat.rms - 8000 / 2 ** 0.5) < 2.0
    # a 440 Hz sine crosses zero ~880 times/s -> zcr ~ 880/8000
    assert abs(feat.zero_crossing_rate - 880 / rate) < 0.01


def test_wav_decode_rejects_non_pcm16():
    import struct as st
    fmt = st.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)  # mu-law, 8-bit
    body = (b"WAVEfmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", 0))
    bad = b"RIFF" + st.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="PCM16"):
        MM.wav_decode(bad)
    with pytest.raises(ValueError, match="RIFF"):
        MM.wav_decode(b"nonsense")


def test_keyframes_detects_planted_cuts(spark):
    import numpy as np
    from industrial_data_pipeline_spark.operators import multimodal as MM
    # one video: frames 0,1 identical; frame 2 a new scene; frame 3
    # same as 2 but different dims (counts as a cut)
    def px(shift, w=8, h=6):
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        return ((x + y + c + shift) % 256).astype(np.uint8)
    rows = [(1, 0, MM.png_encode(px(0))), (1, 1, MM.png_encode(px(0))),
            (1, 2, MM.png_encode(px(50))),
            (1, 3, MM.png_encode(px(50, w=9)))]
    df = spark.createDataFrame(
        rows, "media_id long, frame_idx int, data binary")
    got = {r.frame_idx: r.is_keyframe
           for r in MM.keyframes(df).collect()}
    assert got == {0: True, 1: False, 2: True, 3: True}


def test_native_decoder_seam_routes_and_restores():
    """VERDICT r8 item 8: the native-codec seam. A registered decoder
    takes over its format only (PNG keeps the pure path), the output
    contract is the decode_image tuple, and clearing restores the
    pure-Python default bit-for-bit."""
    import numpy as np

    from industrial_data_pipeline_spark.operators import multimodal as MM
    from industrial_data_pipeline_spark.operators.jpeg import jpeg_encode

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    jpg = jpeg_encode(px, quality=90)
    png = MM.png_encode(px)
    w0, h0, c0, pure = MM.decode_image(jpg)
    calls = []

    def fake(payload):
        calls.append(len(payload))
        return w0, h0, c0, np.zeros((h0, w0, c0), dtype=np.uint8)

    MM.register_native_decoder("jpeg", fake)
    try:
        w, h, c, out = MM.decode_image(jpg)
        assert (w, h, c) == (w0, h0, c0) and calls == [len(jpg)]
        assert not out.any()  # the fake's output came through
        # PNG path untouched by the jpeg registration
        _, _, _, png_px = MM.decode_image(png)
        assert np.array_equal(png_px, px)
    finally:
        MM.clear_native_decoder("jpeg")
    _, _, _, restored = MM.decode_image(jpg)
    assert np.array_equal(restored, pure)  # default back, bit-exact
    import pytest
    with pytest.raises(ValueError):
        MM.register_native_decoder("webp", fake)


def test_native_decoder_pil_parity_on_baseline_jpeg():
    """Parity check of the pure-Python baseline decoder against a
    REAL native decoder (PIL/libjpeg) on our own encoder's output:
    same shape, every sample within the T.81 Annex-A IDCT tolerance
    window (±1 LSB plus chroma-upsample edge rounding). Import-gated:
    skips where PIL isn't installed (this container)."""
    import pytest
    pil = pytest.importorskip("PIL.Image")  # noqa: F841
    import numpy as np

    from industrial_data_pipeline_spark.operators import multimodal as MM
    from industrial_data_pipeline_spark.operators.jpeg import jpeg_encode

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    jpg = jpeg_encode(px, quality=90)
    w, h, c, ours = MM.decode_image(jpg)
    dec = MM.pil_jpeg_decoder()
    nw, nh, nc, theirs = dec(jpg)
    assert (nw, nh, nc) == (w, h, c)
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 2  # IDCT tolerance + upsample rounding


# ------------- video half of the native-codec seam (VERDICT r9 item 7)


def test_video_seam_routing_with_fake():
    """decode_video_frames routes through a registered 'mp4' decoder
    and honors frame-index selection; without one it raises the
    documented NotImplementedError (metadata stays codec-free)."""
    import numpy as np
    import pytest

    from industrial_data_pipeline_spark.operators import multimodal as MM

    payload = MM.mp4_encode_header(8, 6, 500, n_frames=3)
    MM.clear_native_decoder("mp4")
    with pytest.raises(NotImplementedError):
        MM.decode_video_frames(payload)

    def fake(b):
        # deterministic frames keyed on the parsed header — a stand-in
        # obeying the contract: list of uint8 [h, w, 3] in order
        fmt, w, h, _dur, nf = MM.probe_video(b)
        assert fmt == "mp4"
        return [np.full((h, w, 3), i, dtype=np.uint8)
                for i in range(nf)]

    MM.register_native_decoder("mp4", fake)
    try:
        frames = MM.decode_video_frames(payload)
        assert len(frames) == 3
        assert frames[0].shape == (6, 8, 3)
        picked = MM.decode_video_frames(payload, indices=[2, 0])
        assert [int(f[0, 0, 0]) for f in picked] == [2, 0]
    finally:
        MM.clear_native_decoder("mp4")
    with pytest.raises(NotImplementedError):
        MM.decode_video_frames(payload)


def test_video_seam_pyav_parity_on_real_mp4():
    """Parity check of the box-walk metadata probe against a REAL
    container written by PyAV/ffmpeg, plus a real frame decode
    through the seam. Import-gated: skips where PyAV isn't installed
    (this container) — the executable form of the video seam
    contract, mirroring the PIL image parity test above."""
    import io

    import numpy as np
    import pytest

    av = pytest.importorskip("av")
    from industrial_data_pipeline_spark.operators import multimodal as MM

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=10)
        stream.width, stream.height = 32, 24
        stream.pix_fmt = "yuv420p"
        rng = np.random.default_rng(7)
        for _ in range(5):
            img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    payload = buf.getvalue()

    # our codec-free box walk agrees with what ffmpeg wrote
    probed = MM.probe_video(payload)
    assert probed is not None
    fmt, w, h, dur, nf = probed
    assert (fmt, w, h) == ("mp4", 32, 24)
    assert nf == 5

    # and the seam decodes real pixels with the declared shape
    MM.register_native_decoder("mp4", MM.pyav_video_decoder())
    try:
        frames = MM.decode_video_frames(payload)
        assert len(frames) == 5
        assert frames[0].shape == (24, 32, 3)
        assert frames[0].dtype == np.uint8
    finally:
        MM.clear_native_decoder("mp4")
