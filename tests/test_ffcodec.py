"""Native codec core (native/cvvdp_codec.cpp via io/ffcodec.py): lossless
encode/decode roundtrips, metadata, the device-side unpack path, and the
full-metric equivalence of 10-bit HEVC mp4 vs the raw .yuv route.

This is the capability the reference gets from its out-of-process ffmpeg
rgb48le pipe (reference: pycvvdp/video_source_file.py:122-149) and its
libx265 HDR writer (video_writer.py:32-43)."""

import numpy as np
import pytest

from colorvideovdp_tpu.io import ffcodec

pytestmark = pytest.mark.skipif(
    not ffcodec.available(),
    reason="native codec library not built (make -C native)",
)


def _rand_planar(rng, W, H, bit_depth, smooth=False):
    hi = 2 ** bit_depth
    if smooth:
        from scipy.ndimage import gaussian_filter

        def plane(h, w):
            p = gaussian_filter(rng.rand(h, w), 3, mode="nearest")
            p = (p - p.min()) / max(np.ptp(p), 1e-9)
            lo, span = 0.1 * hi, 0.8 * hi
            return (p * span + lo).astype(np.uint16 if bit_depth > 8
                                           else np.uint8)
    else:
        def plane(h, w):
            dt = np.uint16 if bit_depth > 8 else np.uint8
            return rng.randint(0, hi, (h, w)).astype(dt)

    return plane(H, W), plane(H // 2, W // 2), plane(H // 2, W // 2)


def _encode(path, frames, fps=30, bit_depth=8, codec="libx264", crf=-1.0,
            hdr_tags=False):
    H, W = frames[0][0].shape
    w = ffcodec.CodecVideoWriter(str(path), W, H, fps, bit_depth=bit_depth,
                                 codec=codec, crf=crf, hdr_tags=hdr_tags)
    for y, u, v in frames:
        w.write_frame_yuv(y, u, v)
    w.close()


def test_lossless_roundtrip_8bit_h264(tmp_path):
    rng = np.random.RandomState(0)
    frames = [_rand_planar(rng, 64, 48, 8) for _ in range(6)]
    p = tmp_path / "c8.mp4"
    _encode(p, frames, fps=25, bit_depth=8, codec="libx264", crf=-1.0)

    rd = ffcodec.CodecVideoReader(str(p))
    assert (rd.width, rd.height) == (64, 48)
    assert rd.bit_depth == 8 and rd.chroma_ss == "420"
    assert rd.avg_fps == 25.0
    assert rd.frames == 6
    got = rd.get_packed_frames(0, 6)
    for i, (y, u, v) in enumerate(frames):
        ref = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
        assert np.array_equal(got[i], ref), f"frame {i} not byte-exact"
    # Tail repeat + non-contiguous restart (sequential protocol).
    tail = rd.get_packed_frames(4, 4)
    assert np.array_equal(tail[2], tail[1]) and np.array_equal(tail[3],
                                                               tail[1])
    again = rd.get_packed_frames(0, 2)
    assert np.array_equal(again[0], got[0])
    rd.unload()


def test_lossless_roundtrip_10bit_hevc_hdr_tags(tmp_path):
    rng = np.random.RandomState(1)
    frames = [_rand_planar(rng, 64, 48, 10) for _ in range(5)]
    p = tmp_path / "c10.mp4"
    _encode(p, frames, fps=30, bit_depth=10, codec="libx265", crf=-1.0,
            hdr_tags=True)

    rd = ffcodec.CodecVideoReader(str(p))
    assert rd.bit_depth == 10
    assert rd.dtype == np.uint16
    assert rd.color_space == "2020"  # from the bt2020nc stream tag
    assert not rd.color_range_full
    got = rd.get_packed_frames(0, 5)
    for i, (y, u, v) in enumerate(frames):
        ref = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
        assert np.array_equal(got[i], ref), f"frame {i} not byte-exact"
    rd.unload()


def test_lossless_roundtrip_12bit_ffv1(tmp_path):
    """12-bit planar decode (reference handles 10/12/14/16-bit via its
    rgb48le pipe, video_source_file.py:127): ffv1-in-mkv roundtrip stays
    byte-exact and classifies as bit_depth 12."""
    rng = np.random.RandomState(2)
    frames = []
    for _ in range(3):
        y = rng.randint(0, 4096, (48, 64)).astype(np.uint16)
        u = rng.randint(0, 4096, (24, 32)).astype(np.uint16)
        v = rng.randint(0, 4096, (24, 32)).astype(np.uint16)
        frames.append((y, u, v))
    p = tmp_path / "c12.mkv"
    _encode(p, frames, fps=30, bit_depth=12, codec="ffv1", crf=-1.0)

    rd = ffcodec.CodecVideoReader(str(p))
    assert rd.bit_depth == 12 and rd.dtype == np.uint16
    got = rd.get_packed_frames(0, 3)
    for i, (y, u, v) in enumerate(frames):
        ref = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
        assert np.array_equal(got[i], ref), f"frame {i} not byte-exact"
    rd.unload()


def test_lossless_roundtrip_12bit_hevc(tmp_path):
    """12-bit x265 ENCODE (VERDICT r3 item 8): the system libx265 is a
    multi-depth build, so main12 mp4 writes work natively — roundtrip stays
    byte-exact (reference writes through whatever its ffmpeg build supports,
    video_writer.py:35-43)."""
    rng = np.random.RandomState(6)
    frames = [_rand_planar(rng, 64, 48, 12) for _ in range(3)]
    p = tmp_path / "h12.mp4"
    try:
        _encode(p, frames, fps=30, bit_depth=12, codec="libx265", crf=-1.0)
    except RuntimeError as e:
        pytest.skip(f"libx265 build lacks main12: {e}")

    rd = ffcodec.CodecVideoReader(str(p))
    assert rd.bit_depth == 12 and rd.dtype == np.uint16
    got = rd.get_packed_frames(0, 3)
    for i, (y, u, v) in enumerate(frames):
        ref = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
        assert np.array_equal(got[i], ref), f"frame {i} not byte-exact"
    rd.unload()


def test_14bit_decode_converts_via_swscale(tmp_path):
    """Odd decode depths (13-15 bit) are NOT canonical planar layouts: the
    native core classifies them as bit_depth 16 and converts through
    swscale (native/cvvdp_codec.cpp classify_fmt). A true yuv420p14le FFV1
    stream must come back as the exact v<<2 full-scale 16-bit upscale —
    the same planar upconversion the reference's swscale-based rgb48le
    pipe applies (reference: video_source_file.py:127)."""
    rng = np.random.RandomState(3)
    H, W = 48, 64
    frames = []
    for _ in range(2):
        y = rng.randint(0, 2 ** 14, (H, W)).astype(np.uint16)
        u = rng.randint(0, 2 ** 14, (H // 2, W // 2)).astype(np.uint16)
        v = rng.randint(0, 2 ** 14, (H // 2, W // 2)).astype(np.uint16)
        frames.append((y, u, v))
    p = tmp_path / "c14.mkv"
    _encode(p, frames, fps=30, bit_depth=14, codec="ffv1", crf=-1.0)

    rd = ffcodec.CodecVideoReader(str(p))
    assert rd.bit_depth == 16 and rd.dtype == np.uint16  # canonicalised
    got = rd.get_packed_frames(0, 2)
    for i, (y, u, v) in enumerate(frames):
        ref = np.concatenate([y.ravel(), u.ravel(), v.ravel()]).astype(
            np.uint16) << 2
        assert np.array_equal(got[i], ref), f"frame {i}: swscale 14->16"
    rd.unload()


def test_odd_dimension_420_ceil_chroma(tmp_path):
    """Odd-dimension 4:2:0 video (legal via container cropping) carries
    ceil-sized chroma planes; flooring would drop the last chroma
    column/row (code-review finding)."""
    rng = np.random.RandomState(4)
    W, H = 63, 49
    y = rng.randint(0, 256, (H, W)).astype(np.uint8)
    u = rng.randint(0, 256, ((H + 1) // 2, (W + 1) // 2)).astype(np.uint8)
    v = rng.randint(0, 256, ((H + 1) // 2, (W + 1) // 2)).astype(np.uint8)
    p = tmp_path / "odd.mkv"
    w = ffcodec.CodecVideoWriter(str(p), W, H, 30, bit_depth=8,
                                 codec="ffv1", crf=-1.0)
    for _ in range(2):
        w.write_frame_yuv(y, u, v)
    w.close()
    rd = ffcodec.CodecVideoReader(str(p))
    assert rd.uv_shape == (25, 32)
    got = rd.get_packed_frames(0, 2)
    ref = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
    assert np.array_equal(got[0], ref)
    rd.unload()


def test_colour_matrix_selection(tmp_path):
    """Matrix selection mirrors the reference's DEFAULT mp4 route
    (video_source_file.py:268-277): untagged streams get BT.709 at any
    size; explicit tags are honoured. SDR x264 encodes from this package
    are tagged BT.601 (truthful — the writers convert with 601) so they
    round-trip exactly; mpeg4 stays untagged like the reference's SDR
    preview writer."""
    z = np.zeros((720, 1280), np.uint8) + 128
    zc = np.zeros((360, 640), np.uint8) + 128

    p601 = tmp_path / "tagged.mp4"
    w = ffcodec.CodecVideoWriter(str(p601), 1280, 720, 30, bit_depth=8,
                                 codec="libx264", crf=20.0)
    w.write_frame_yuv(z, zc, zc)
    w.close()
    rd = ffcodec.CodecVideoReader(str(p601))
    assert rd.color_space == "601"  # explicit smpte170m tag honoured
    assert not rd.color_range_full
    rd.unload()

    pun = tmp_path / "untagged.mp4"
    w = ffcodec.CodecVideoWriter(str(pun), 1280, 720, 30, bit_depth=8,
                                 codec="mpeg4", crf=3.0)
    w.write_frame_yuv(z, zc, zc)
    w.close()
    rd = ffcodec.CodecVideoReader(str(pun))
    assert rd.color_space == "709"  # untagged -> reference-default 709
    rd.unload()


def test_native_writer_uint8_frames(tmp_path):
    """VideoWriter accepts uint8 SDR frames (its documented contract);
    the native route must rescale them by /255 before quantisation
    (code-review finding: the float cast ran first, clipping 0..255 to 1
    and producing solid-white dumps)."""
    from colorvideovdp_tpu.io.writers import VideoWriter

    p = tmp_path / "u8.mp4"
    vw = VideoWriter(str(p), fps=24)
    grad = np.tile(np.arange(64, dtype=np.uint8) * 4, (48, 1))
    frame = np.stack([grad] * 3, axis=-1)
    for _ in range(2):
        vw.write_frame_rgb(frame)
    vw.close()
    rd = ffcodec.CodecVideoReader(str(p))
    got = rd.get_packed_frames(0, 1)[0]
    Y = got[: 64 * 48].reshape(48, 64).astype(np.float32)
    # A gradient, not a clipped constant: wide luma spread, monotone rows.
    assert Y.max() - Y.min() > 150
    assert Y[0, -1] > Y[0, 0] + 100
    rd.unload()


def test_codec_source_10bit_mp4_matches_yuv_route(tmp_path):
    """The same 10-bit content fed as a lossless HEVC mp4 and as a raw .yuv
    file must score the same JOD: both unpack on-device with the BT.2020
    matrix (the .yuv table's 5-decimal constants vs the codec path's exact
    Kr/Kb derivation differ at ~1e-5 in RGB)."""
    import colorvideovdp_tpu as cv
    from colorvideovdp_tpu.io.video_source_file import (
        video_source_codec_file,
    )
    from colorvideovdp_tpu.io.yuv import video_source_yuv_file

    rng = np.random.RandomState(7)
    W, H, N = 96, 64, 6
    ref_frames = [_rand_planar(rng, W, H, 10, smooth=True) for _ in range(N)]
    tst_frames = [
        tuple(np.clip(p.astype(np.int32)
                      + rng.randint(-40, 40, p.shape), 0, 1023)
              .astype(np.uint16) for p in f)
        for f in ref_frames
    ]

    paths = {}
    for name, frames in (("ref", ref_frames), ("tst", tst_frames)):
        mp4 = tmp_path / f"{name}.mp4"
        _encode(mp4, frames, fps=30, bit_depth=10, codec="libx265",
                crf=-1.0, hdr_tags=True)
        yuv = tmp_path / f"{name}_{W}x{H}p30_420_10b_pq2020.yuv"
        with open(yuv, "wb") as f:
            for y, u, v in frames:
                f.write(y.astype("<u2").tobytes())
                f.write(u.astype("<u2").tobytes())
                f.write(v.astype("<u2").tobytes())
        paths[name] = (mp4, yuv)

    met = cv.cvvdp(display_name="standard_hdr_pq")
    src_mp4 = video_source_codec_file(
        str(paths["tst"][0]), str(paths["ref"][0]),
        display_photometry="standard_hdr_pq",
    )
    q_mp4, _ = met.predict_video_source(src_mp4)
    src_yuv = video_source_yuv_file(
        str(paths["tst"][1]), str(paths["ref"][1]),
        display_photometry="standard_hdr_pq",
    )
    q_yuv, _ = met.predict_video_source(src_yuv)
    assert abs(float(q_mp4) - float(q_yuv)) < 2e-3, (
        float(q_mp4), float(q_yuv))


def test_codec_unpack_matches_reference_yuv_reader(reference, tmp_path):
    """Oracle parity for the mp4 conversion math: the reference's DEFAULT
    mp4 reader (video_reader_yuv_pytorch.unpack — fixed->float, torch
    bilinear chroma upsample, 709/2020 matrix) run on the same planes must
    agree with this package's device-side unpack to ~1e-4 (the reference
    hard-codes 4-decimal matrix constants; we derive them exactly)."""
    import jax.numpy as jnp
    import torch

    from colorvideovdp_tpu.io.video_source_file import (
        video_source_codec_file,
    )

    rng = np.random.RandomState(17)
    W, H = 96, 64
    for bit_depth, tag_hdr, ref_cs in ((10, True, "bt2020nc"),
                                       (8, False, "unknown")):
        frames = [_rand_planar(rng, W, H, bit_depth, smooth=True)]
        p = tmp_path / f"o{bit_depth}.mp4"
        codec = "libx265" if bit_depth == 10 else "mpeg4"
        _encode(p, frames, fps=30, bit_depth=bit_depth, codec=codec,
                crf=-1.0 if bit_depth == 10 else 2.0, hdr_tags=tag_hdr)

        src = video_source_codec_file(str(p), str(p),
                                      display_photometry="standard_fhd")
        blk = src.get_raw_block("test", 0, 1)
        ours = np.asarray(src.unpack_raw_block(jnp.asarray(blk)))
        ours_hwc = ours[0, :, 0].transpose(1, 2, 0)

        import importlib

        ref_vsf = importlib.import_module("pycvvdp.video_source_file")
        vrc = ref_vsf.video_reader_yuv_pytorch
        vr = vrc.__new__(vrc)
        vr.bit_depth = bit_depth
        vr.chroma_ss = "420"
        vr.color_space = ref_cs
        vr.height, vr.width = H, W
        vr.y_pixels = H * W
        vr.y_shape = (H, W)
        vr.uv_shape = (H // 2, W // 2)
        vr.uv_pixels = (H // 2) * (W // 2)
        with torch.no_grad():
            # The decoded planes, not the pre-encode ones: mpeg4 at q2 is
            # not lossless, and the comparison is about conversion math.
            rgb_ref = vr.unpack(blk[0, 0], torch.device("cpu")).numpy()
        d = np.abs(ours_hwc - rgb_ref)
        assert d.max() < 1.5e-4, (bit_depth, d.max())


def test_codec_unpack_matches_cv2_8bit(tmp_path):
    """8-bit SDR cross-validation against OpenCV's swscale conversion.

    4:4:4 content (no chroma upsampling involved) must match to fixed-point
    rounding — this pins the matrix (601 heuristic for SD) and the
    limited-range scaling. 4:2:0 gets a loose bound only: swscale's default
    chroma upsampler duplicates pixels (nearest) while this package uses
    half-pixel bilinear everywhere — deliberately matching the reference's
    own .yuv route (video_source_yuv.py uses torch bilinear) rather than
    its mp4 pipe; upstream is internally inconsistent between the two."""
    import jax.numpy as jnp

    from colorvideovdp_tpu.io.video_source_file import (
        video_source_codec_file,
        video_source_video_file,
    )

    rng = np.random.RandomState(3)

    def _compare(chroma, frames):
        p = tmp_path / f"sdr{chroma}.mp4"
        H, W = frames[0][0].shape
        w = ffcodec.CodecVideoWriter(str(p), W, H, 24, bit_depth=8,
                                     chroma=chroma, codec="libx264",
                                     crf=-1.0)
        for y, u, v in frames:
            w.write_frame_yuv(y, u, v)
        w.close()
        src = video_source_codec_file(str(p), str(p),
                                      display_photometry="standard_fhd")
        blk = src.get_raw_block("test", 0, len(frames))
        rgb_native = np.asarray(src.unpack_raw_block(jnp.asarray(blk)))
        cv2_src = video_source_video_file(str(p), str(p),
                                          display_photometry="standard_fhd")
        blk_cv2 = cv2_src.get_raw_block("test", 0, len(frames))
        rgb_cv2 = blk_cv2[0].transpose(1, 0, 2, 3).astype(np.float32) / 255.0
        return np.abs(rgb_native[0] - rgb_cv2)

    def _p444(h, w):
        y, _u, _v = _rand_planar(rng, w, h, 8, smooth=True)
        return y

    H, W = 64, 96
    frames444 = [(_p444(H, W), _p444(H, W), _p444(H, W)) for _ in range(2)]
    d = _compare(444, frames444)
    assert d.max() < 3.0 / 255.0, d.max()

    frames420 = [_rand_planar(rng, W, H, 8, smooth=True) for _ in range(2)]
    d = _compare(420, frames420)
    assert d.mean() < 0.02 and d.max() < 0.12, (d.mean(), d.max())


def test_facade_dispatch_and_fallback(tmp_path, monkeypatch):
    from colorvideovdp_tpu.io.video_source_file import (
        video_source_codec_file,
        video_source_file,
        video_source_video_file,
    )

    rng = np.random.RandomState(5)
    frames8 = [_rand_planar(rng, 64, 48, 8) for _ in range(3)]
    p8 = tmp_path / "a.mp4"
    _encode(p8, frames8, bit_depth=8, codec="libx264", crf=-1.0)

    src = video_source_file(str(p8), str(p8),
                            display_photometry="standard_fhd")
    assert isinstance(src, video_source_codec_file)

    # Env kill-switch forces the OpenCV reader.
    monkeypatch.setenv("CVVDP_NO_NATIVE_DECODE", "1")
    src = video_source_file(str(p8), str(p8),
                            display_photometry="standard_fhd")
    assert isinstance(src, video_source_video_file)
    monkeypatch.delenv("CVVDP_NO_NATIVE_DECODE")

    # Mixed-format pair (8-bit test vs 10-bit reference) falls back.
    frames10 = [_rand_planar(rng, 64, 48, 10) for _ in range(3)]
    p10 = tmp_path / "b.mp4"
    _encode(p10, frames10, bit_depth=10, codec="libx265", crf=-1.0)
    src = video_source_file(str(p8), str(p10),
                            display_photometry="standard_fhd")
    assert isinstance(src, video_source_video_file)


def test_native_hdr_mp4_writer(tmp_path):
    """VideoWriter with hdr_mode writes a real 10-bit HEVC mp4 carrying the
    PQ/BT.2020 stream tags (reference: video_writer.py:32-43) that decodes
    back to the written content within crf-12 loss."""
    from colorvideovdp_tpu.io.writers import VideoWriter

    rng = np.random.RandomState(11)
    base = rng.rand(48, 64, 3).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, (4, 4, 0), mode="nearest")
    base = (base - base.min()) / max(np.ptp(base), 1e-9)

    p = tmp_path / "hdr.mp4"
    w = VideoWriter(str(p), fps=30, hdr_mode=True, codec="h265")
    for i in range(4):
        w.write_frame_rgb(np.clip(base * (0.6 + 0.1 * i), 0, 1))
    w.close()
    assert p.exists() and p.stat().st_size > 0

    rd = ffcodec.CodecVideoReader(str(p))
    assert rd.bit_depth == 10 and rd.color_space == "2020"
    assert rd.color_trc == 16  # SMPTE-2084 (PQ)
    assert rd.frames == 4
    got = rd.get_packed_frames(0, 1)[0]
    Y = got[: 64 * 48].reshape(48, 64).astype(np.float64)
    # Luma should reconstruct the written frame's luma within crf-12 loss.
    luma_row, _cb, _cr = ffcodec.rgb_to_ycbcr_coeffs("2020")
    Y_ref = (np.clip(base * 0.6, 0, 1) @ luma_row) * 219.0 * 4 + 16 * 4
    assert np.abs(Y - Y_ref).mean() < 16.0  # ~1 8-bit code value avg
    rd.unload()


def test_truncated_and_garbage_files(tmp_path):
    """Failure taxonomy: a garbage 'mp4' fails at open (the facade then
    falls back to OpenCV, which raises its own vq_exception); a MID-STREAM
    truncation (streamable mkv — mp4 keeps its moov index at the tail, so
    a cut mp4 simply fails to open) decodes what it can, warns ONCE, and
    repeats the last good frame for the rest of the metadata-claimed
    count — no hang, no crash, no per-frame warning storm."""
    rng = np.random.RandomState(6)
    frames = [_rand_planar(rng, 64, 48, 8) for _ in range(6)]

    garbage = tmp_path / "garbage.mp4"
    garbage.write_bytes(b"not a video" * 100)
    with pytest.raises(RuntimeError):
        ffcodec.CodecVideoReader(str(garbage))

    p = tmp_path / "full.mkv"
    _encode(p, frames, fps=30, bit_depth=8, codec="ffv1", crf=-1.0)
    data = p.read_bytes()
    trunc = tmp_path / "trunc.mkv"
    trunc.write_bytes(data[: len(data) // 2])
    rd = ffcodec.CodecVideoReader(str(trunc), frames=6)
    # Frame counting already hit the cut and clamped the count (and the
    # rewind cleared the error latch — early frames decode again).
    assert 0 < rd.frames < 6
    # Simulate optimistic container metadata claiming all 6 frames: the
    # mid-stream error must latch as EOF after ONE warning and the tail
    # must repeat the last good frame — no hang, no per-frame retry storm.
    rd.frames = 6
    got = rd.get_packed_frames(0, 6)
    assert got.shape == (6, rd.frame_pixels)
    assert rd._eof  # latched; no further native calls until rewind
    ref0 = np.concatenate([a.ravel() for a in frames[0]])
    assert np.array_equal(got[0], ref0)
    assert np.array_equal(got[5], got[rd._next - 1])
    rd.unload()


def test_dm_preview_hdr_video_real_mp4(tmp_path):
    """dm-preview on HDR video now yields real 10-bit HEVC mp4 with PQ tags
    (reference behaviour: dm_preview_metric.py via video_writer.py:32-43)
    instead of the y4m stand-in."""
    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.metrics.dm_preview import dm_preview

    rng = np.random.RandomState(21)
    vid = (rng.rand(48, 64, 3, 4) * 200 + 20).astype(np.float32)  # HWCF lin
    src = video_source_array(vid, vid, fps=30, dim_order="HWCF",
                             display_photometry="standard_hdr_linear")
    m = dm_preview(display_name="standard_hdr_linear")
    m.set_base_fname(str(tmp_path / "prev"))
    m.predict_video_source(src)

    for which in ("test", "reference"):
        p = tmp_path / f"prev-{which}.mp4"
        assert p.exists() and p.stat().st_size > 0
        rd = ffcodec.CodecVideoReader(str(p))
        assert rd.bit_depth == 10 and rd.color_space == "2020"
        assert rd.color_trc == 16  # PQ
        assert rd.frames == 4 and rd.avg_fps == 30.0
        rd.unload()


def test_temp_resample_source_native_inner(tmp_path):
    """video_source_temp_resample_file over native-decoded inner sources:
    the packed-planar unpack hook must surface on the wrapper (the metric
    builds one per-block program for both streams), and mismatched decode
    formats must drop both streams to the OpenCV reader (reference:
    video_source_file.py:482-543)."""
    import jax.numpy as jnp

    from colorvideovdp_tpu.io.video_source_file import (
        video_source_temp_resample_file,
    )

    rng = np.random.RandomState(13)
    frames = [_rand_planar(rng, 64, 48, 8, smooth=True) for _ in range(8)]
    p24 = tmp_path / "a24.mp4"
    p30 = tmp_path / "b30.mp4"
    _encode(p24, frames, fps=24, bit_depth=8, codec="libx264", crf=-1.0)
    _encode(p30, frames[:6], fps=30, bit_depth=8, codec="libx264", crf=-1.0)

    src = video_source_temp_resample_file(
        str(p24), str(p30), display_photometry="standard_fhd")
    # lcm(24, 30) = 120 <= 166 cap
    assert src.get_frames_per_second() == 120
    h, w, n = src.get_video_size()
    assert (h, w) == (48, 64)
    # min(8/24, 6/30) s * 120 fps = 0.2 s * 120 = 24 frames
    assert n == 24
    assert hasattr(src, "unpack_raw_block")
    blk = src.get_raw_block("test", 0, 4)
    assert blk.shape == (1, 4, 64 * 48 * 3 // 2)
    rgb = np.asarray(src.unpack_raw_block(jnp.asarray(blk)))
    assert rgb.shape == (1, 3, 4, 48, 64)
    # Frame 0..4 at 120fps map to source frames 0,0,0,0 then 0/1 at 24fps.
    assert np.array_equal(blk[0, 0], blk[0, 1])

    # Mixed formats: 8-bit test vs 10-bit reference -> cv2 for both.
    p10 = tmp_path / "c30_10b.mp4"
    frames10 = [tuple((p.astype(np.uint16) * 4) for p in f)
                for f in frames[:6]]
    _encode(p10, frames10, fps=30, bit_depth=10, codec="libx265", crf=-1.0)
    src2 = video_source_temp_resample_file(
        str(p24), str(p10), display_photometry="standard_fhd")
    assert not hasattr(src2, "unpack_raw_block")
    blk2 = src2.get_raw_block("test", 0, 2)
    assert blk2.shape == (1, 2, 3, 48, 64) and blk2.dtype == np.uint8


def test_codec_source_preload_and_frame_list(tmp_path):
    from colorvideovdp_tpu.io.video_source_file import (
        video_source_codec_file,
    )

    rng = np.random.RandomState(9)
    frames = [_rand_planar(rng, 64, 48, 8) for _ in range(5)]
    p = tmp_path / "c.mp4"
    _encode(p, frames, bit_depth=8, codec="libx264", crf=-1.0)

    for preload in (False, True):
        src = video_source_codec_file(str(p), str(p),
                                      display_photometry="standard_fhd",
                                      preload=preload)
        # Symmetric-padding head access then sequential blocks from 0.
        head = src.get_raw_frame_list("test", [2, 1, 0])
        blk = src.get_raw_block("test", 0, 5)
        for i, (y, u, v) in enumerate(frames):
            ref = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
            assert np.array_equal(blk[0, i], ref)
        assert np.array_equal(head[0, 0], blk[0, 2])
        assert np.array_equal(head[0, 2], blk[0, 0])
