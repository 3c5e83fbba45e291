"""IO layer: YUV reader parity, EXR codec roundtrip, file sources, writers."""

import os

import numpy as np
import pytest

from colorvideovdp_tpu.utils import exr


def test_exr_roundtrip_zip(tmp_path):
    img = np.random.RandomState(0).rand(37, 53, 3).astype(np.float32) * 100
    f = str(tmp_path / "t.exr")
    exr.write(f, img, compression="zip")
    back = exr.read(f)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_exr_roundtrip_none_and_gray(tmp_path):
    img = np.random.RandomState(1).rand(16, 128, 1).astype(np.float32)
    f = str(tmp_path / "g.exr")
    exr.write(f, img, compression="none")
    back = exr.read(f)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_exr_half(tmp_path):
    img = np.random.RandomState(2).rand(8, 8, 3).astype(np.float32)
    f = str(tmp_path / "h.exr")
    exr.write(f, img, half=True)
    back = exr.read(f)
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_yuv_filename_metadata():
    from colorvideovdp_tpu.io.yuv import decode_video_props

    p = decode_video_props("/x/seq_1280x720p25_420_8bit_sdr.yuv")
    assert (p["width"], p["height"], p["fps"]) == (1280, 720, 25)
    assert p["chroma_ss"] == "420" and p["bit_depth"] == 8
    assert p["color_space"] == "709"
    p = decode_video_props("/x/a_1920x1080_10b_444_2020_59.94fps.yuv")
    assert p["bit_depth"] == 10 and p["chroma_ss"] == "444"
    assert p["color_space"] == "2020" and abs(p["fps"] - 59.94) < 1e-6


def test_yuv_source_matches_oracle(reference, tmp_path):
    """Byte-exact .yuv decode + on-device unpack vs the reference reader."""
    import torch

    H, W, N = 32, 48, 3
    rng = np.random.RandomState(0)
    frames = []
    for _ in range(N):
        Y = rng.randint(16, 236, (H, W), dtype=np.uint8)
        u = rng.randint(16, 241, (H // 2, W // 2), dtype=np.uint8)
        v = rng.randint(16, 241, (H // 2, W // 2), dtype=np.uint8)
        frames.append((Y, u, v))
    fname = str(tmp_path / f"clip_{W}x{H}p30_420_8bit_sdr.yuv")
    with open(fname, "wb") as f:
        for Y, u, v in frames:
            f.write(Y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())

    from colorvideovdp_tpu.io.yuv import video_source_yuv_file

    vs = video_source_yuv_file(fname, fname,
                               display_photometry="standard_fhd")
    assert vs.get_video_size() == (H, W, N)
    assert vs.get_frames_per_second() == 30

    import jax.numpy as jnp

    packed = vs.get_raw_block("test", 0, N)
    rgb = np.asarray(vs.unpack_raw_block(jnp.asarray(packed)))

    ref_reader = reference.video_source_yuv.YUVReader(fname)
    for ff in range(N):
        ref_rgb = ref_reader.get_frame_rgb_tensor(
            ff, torch.device("cpu")
        ).numpy()  # (H, W, 3)
        np.testing.assert_allclose(
            rgb[0, :, ff].transpose(1, 2, 0), ref_rgb, atol=2e-5
        )


def test_video_source_file_mp4():
    from colorvideovdp_tpu.io.video_source_file import video_source_file

    vs = video_source_file(
        "/root/reference/example_media/aliasing/ferris-bicubic-bicubic.mp4",
        "/root/reference/example_media/aliasing/ferris-ref.mp4",
        display_photometry="standard_fhd",
    )
    h, w, n = vs.get_video_size()
    assert (h, w) == (720, 1280) and n == 60
    assert vs.get_frames_per_second() == 25.0
    blk = vs.get_raw_block("test", 0, 4)
    assert blk.shape == (1, 4, 3, 720, 1280) and blk.dtype == np.uint8


def test_video_source_mp4_reread_same_block():
    """Re-requesting already-returned frames must rewind, not silently hand
    out the NEXT frame (latent off-by-one in the sequential-read guard:
    start == curr_frame is a re-read)."""
    from colorvideovdp_tpu.io.video_source_file import video_source_file

    vs = video_source_file(
        "/root/reference/example_media/aliasing/ferris-ref.mp4",
        "/root/reference/example_media/aliasing/ferris-ref.mp4",
        display_photometry="standard_fhd",
    )
    vs.get_video_size()
    a = vs.get_raw_block("test", 5, 3).copy()
    b = vs.get_raw_block("test", 5, 3)  # exact re-read
    np.testing.assert_array_equal(a, b)
    c = vs.get_raw_block("test", 7, 2)  # overlaps the last frame returned
    np.testing.assert_array_equal(a[0, 2], c[0, 0])


def test_image_source_and_mat(tmp_path):
    from scipy.io import savemat

    from colorvideovdp_tpu.io.video_source_file import video_source_file

    img = "/root/reference/example_media/wavy_facade.png"
    vs = video_source_file(img, img, display_photometry="standard_4k")
    assert vs.get_video_size() == (683, 1024, 1)

    arr = np.random.RandomState(0).rand(24, 32, 3).astype(np.float32) * 100
    mat = str(tmp_path / "im.mat")
    savemat(mat, {"I_vid": arr})
    vs2 = video_source_file(mat, mat, display_photometry="standard_4k")
    assert vs2.get_video_size() == (24, 32, 1)
    blk = vs2.get_raw_block("test", 0, 1)
    assert blk.shape == (1, 1, 3, 24, 32)


def test_video_writer_mp4(tmp_path):
    from colorvideovdp_tpu.io.writers import VideoWriter

    f = str(tmp_path / "o.mp4")
    vw = VideoWriter(f, fps=24)
    for _ in range(4):
        vw.write_frame_rgb(np.random.rand(48, 64, 3).astype(np.float32))
    vw.close()
    assert os.path.getsize(f) > 500


def test_exr_native_numpy_interop(tmp_path):
    """EXR files written with the native codec decode with the numpy path
    and vice versa."""
    from colorvideovdp_tpu.utils import exr, native

    img = np.random.RandomState(3).rand(21, 45, 3).astype(np.float32) * 10
    f1 = str(tmp_path / "n.exr")
    exr.write(f1, img, compression="zip")
    # force numpy path for decode
    was = native._LIB
    try:
        native._LIB = None
        back = exr.read(f1)
    finally:
        native._LIB = was
    np.testing.assert_allclose(back, img, rtol=1e-6)
    # numpy-written, native-read
    try:
        native._LIB = None
        f2 = str(tmp_path / "p.exr")
        exr.write(f2, img, compression="zip")
    finally:
        native._LIB = was
    back2 = exr.read(f2)
    np.testing.assert_allclose(back2, img, rtol=1e-6)
