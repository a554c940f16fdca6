"""Native C++ loader tests: build, ring-buffer streaming, crop-resize parity
with the device-side bilinear math, plus prep tooling."""

import numpy as np
import pytest

import jax.numpy as jnp

from s2v_tpu.io.native import NativeClipReader, crop_resize_u8f32, get_lib
from s2v_tpu.ops.image import resize_bilinear
from s2v_tpu.prep.tools import frame_windows, normalize_text

RNG = np.random.RandomState(161)


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of s2v_loader failed"


def test_crop_resize_matches_device_math():
    frame = (RNG.rand(120, 100, 3) * 255).astype(np.uint8)
    box = (10, 90, 5, 77)  # y0, y1, x0, x1
    out = crop_resize_u8f32(frame, box, (64, 48), scale=1.0 / 255.0)
    want = np.asarray(
        resize_bilinear(
            jnp.asarray(frame[box[0]:box[1], box[2]:box[3]][None].astype(np.float32)),
            (64, 48),
        )
    )[0] / 255.0
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_crop_resize_numpy_fallback_matches_native():
    frame = (RNG.rand(50, 60, 3) * 255).astype(np.uint8)
    box = (0, 50, 0, 60)
    native = crop_resize_u8f32(frame, box, (37, 23))
    import s2v_tpu.io.native as nat

    lib = nat._LIB
    nat._LIB = None
    try:
        orig_build = nat._build
        nat._build = lambda: None
        fallback = crop_resize_u8f32(frame, box, (37, 23))
    finally:
        nat._LIB = lib
        nat._build = orig_build
    np.testing.assert_allclose(native, fallback, rtol=1e-4, atol=1e-4)


def test_ring_loader_streams_all_frames(tmp_path):
    h, w = 24, 16
    frames = (RNG.rand(13, h, w, 3) * 255).astype(np.uint8)
    raw = tmp_path / "clip.raw"
    raw.write_bytes(frames.tobytes())

    reader = NativeClipReader(str(raw), h, w, slots=4)
    got = list(reader)
    reader.close()
    assert len(got) == 13
    np.testing.assert_array_equal(np.stack(got), frames)


def test_normalize_text():
    assert normalize_text("SPEAKER 1: hello world\nsecond line") == " hello world"


def test_frame_windows_shapes():
    wav = RNG.randn(16000).astype(np.float32)
    win = frame_windows(wav, 16000, 25, 25.0)
    assert win.shape == (25, 3200)  # 0.2 s at 16 kHz
    # frame 0 window starts at the pad: first 1600 samples are the pad zeros
    assert np.all(win[0, :1600] == 0)
