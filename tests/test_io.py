"""Audio/video IO: npz clip roundtrip, WAV loading + resample."""

import wave

import numpy as np

from s2v_tpu.io.audio_io import load_wav, resample
from s2v_tpu.io.video_io import VideoReader, VideoWriter, mux_audio

RNG = np.random.RandomState(291)


def test_npz_clip_roundtrip(tmp_path):
    frames = (RNG.rand(5, 32, 48, 3) * 255).astype(np.uint8)
    w = VideoWriter(str(tmp_path / "clip.npz"), 30.0, (32, 48))
    for f in frames:
        w.write(f)
    w.close()
    r = VideoReader(w.path)
    assert r.fps == 30.0
    got = r.read_all()
    np.testing.assert_array_equal(got, frames)
    out = mux_audio(w.path, "unused.wav", str(tmp_path / "final.npz"))
    assert out.endswith(".npz")


def test_load_wav_pcm16_and_resample(tmp_path):
    sr = 8000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 100 * t))
    path = str(tmp_path / "a.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((sig * 32767).astype(np.int16).tobytes())
    wav = load_wav(path, 16000)
    assert wav.dtype == np.float32
    assert abs(len(wav) - 16000) <= 2  # resampled 8k -> 16k
    assert abs(wav.max() - 0.5) < 0.05

    # stereo averaging
    path2 = str(tmp_path / "b.wav")
    stereo = np.stack([sig, -sig], 1).reshape(-1)
    with wave.open(path2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((stereo * 32767).astype(np.int16).tobytes())
    wav2 = load_wav(path2, 8000)
    assert np.abs(wav2).max() < 1e-3  # L/R cancel


def test_resample_identity():
    x = RNG.randn(1000).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)
