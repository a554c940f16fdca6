"""FastDTW + find_best_audio."""

import numpy as np

from s2v_tpu.audio.dtw import _band_dtw, fastdtw, find_best_audio

RNG = np.random.RandomState(281)


def test_dtw_identical_is_zero():
    a = RNG.randn(50)
    assert _band_dtw(a, a)[0] == 0.0
    assert fastdtw(a, a) == 0.0


def test_dtw_handles_time_warp():
    t = np.linspace(0, 4 * np.pi, 80)
    a = np.sin(t)
    b = np.sin(t * 1.1)  # slightly faster
    c = RNG.randn(80)
    assert fastdtw(a, b) < fastdtw(a, c)


def test_fastdtw_close_to_exact():
    a = RNG.randn(64)
    b = RNG.randn(64)
    exact, _ = _band_dtw(a, b)
    approx = fastdtw(a, b, radius=2)
    assert approx >= exact - 1e-9
    assert approx <= exact * 1.5  # multilevel approximation stays close


def test_find_best_audio_picks_similar():
    t = np.linspace(0, 2 * np.pi, 2048)
    src = np.sin(3 * t).astype(np.float32)
    db = {
        "match.wav": (np.sin(3 * t + 0.1) + 0.01 * RNG.randn(2048)).astype(np.float32),
        "other.wav": (np.sign(np.sin(13 * t))).astype(np.float32),
        "noise.wav": RNG.randn(2048).astype(np.float32),
    }
    name, dist = find_best_audio(src, db, downsample=8)
    assert name == "match.wav"
