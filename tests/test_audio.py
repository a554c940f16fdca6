"""Golden tests for the mel frontend vs an independent numpy/scipy
implementation of futils/audio.py (librosa 0.9.2 semantics: periodic hann,
center=True, reflect padding, slaney mel, symmetric +-4 normalize)."""

import numpy as np
import scipy.signal

import jax.numpy as jnp

from s2v_tpu.audio import melspectrogram, preemphasis
from s2v_tpu.audio.filters import hann_window, mel_filterbank
from s2v_tpu.audio.melspec import (
    mel_chunk_starts,
    mel_chunks_for_frames,
    num_mel_chunks,
    stft_magnitude,
)
from s2v_tpu.utils.config import AudioConfig

CFG = AudioConfig()
RNG = np.random.RandomState(42)


def ref_stft_mag(y: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """librosa.stft magnitude via numpy FFT (librosa 0.9.2 defaults)."""
    pad = cfg.n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    window = hann_window(cfg.win_size).astype(np.float64)
    n_frames = 1 + (len(y) - cfg.n_fft) // cfg.hop_size
    frames = np.stack(
        [y[i * cfg.hop_size : i * cfg.hop_size + cfg.n_fft] for i in range(n_frames)]
    )
    spec = np.fft.rfft(frames * window, n=cfg.n_fft, axis=1)
    return np.abs(spec)  # [n_frames, n_freq]


def ref_melspectrogram(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Direct port of the futils/audio.py math in numpy."""
    if cfg.preemphasize:
        wav = scipy.signal.lfilter([1, -cfg.preemphasis], [1], wav)
    mag = ref_stft_mag(wav, cfg).T  # [n_freq, n_frames]
    mel_basis = mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax
    ).astype(np.float64)
    mel = mel_basis @ mag
    min_level = np.exp(cfg.min_level_db / 20 * np.log(10))
    s = 20 * np.log10(np.maximum(min_level, mel)) - cfg.ref_level_db
    out = (2 * cfg.max_abs_value) * (
        (s - cfg.min_level_db) / (-cfg.min_level_db)
    ) - cfg.max_abs_value
    return np.clip(out, -cfg.max_abs_value, cfg.max_abs_value)


def make_wav(seconds=1.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    wav = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t)
        + 0.05 * RNG.randn(len(t))
    )
    return (wav / np.abs(wav).max() * 0.9).astype(np.float32)


def test_preemphasis_matches_lfilter():
    wav = make_wav(0.1)
    want = scipy.signal.lfilter([1, -0.97], [1], wav)
    got = np.asarray(preemphasis(jnp.asarray(wav), 0.97))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_stft_magnitude_matches_fft():
    wav = make_wav(0.3)
    want = ref_stft_mag(wav.astype(np.float64), CFG)
    got = np.asarray(stft_magnitude(jnp.asarray(wav), CFG))
    assert got.shape == want.shape
    # f32 matmul-DFT vs f64 FFT: compare on the dB scale the pipeline uses.
    floor = 1e-3
    db_err = 20 * np.abs(
        np.log10(np.maximum(got, floor)) - np.log10(np.maximum(want, floor))
    )
    assert db_err.max() < 0.5, db_err.max()


def test_melspectrogram_matches_reference_math():
    wav = make_wav(1.0)
    want = ref_melspectrogram(wav.astype(np.float64), CFG)
    got = np.asarray(melspectrogram(jnp.asarray(wav), CFG))
    assert got.shape == want.shape == (80, 1 + len(wav) // 200)
    # dB scale: absolute tolerance dominates near the clip boundary
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-2)
    assert got.min() >= -4.0 and got.max() <= 4.0


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 800, 80, 55.0, 7600.0)
    assert fb.shape == (80, 401)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()
    # triangle peaks are unimodal: one argmax strictly increasing
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()


def test_mel_chunking_matches_reference_loop():
    """Replicate the while-loop at inference.py:209-216 exactly."""
    fps = 25.0
    n_mel = 1 + 16000 // 200  # 1 second of audio
    # reference loop
    mel_step_size, mel_idx_multiplier, i, ref_starts = 16, 80.0 / fps, 0, []
    while True:
        start_idx = int(i * mel_idx_multiplier)
        if start_idx + mel_step_size > n_mel:
            ref_starts.append(n_mel - mel_step_size)
            break
        ref_starts.append(start_idx)
        i += 1

    n = num_mel_chunks(n_mel, fps)
    assert n == len(ref_starts)
    starts = mel_chunk_starts(n_mel, n, fps)
    np.testing.assert_array_equal(starts, np.asarray(ref_starts))

    mel = jnp.asarray(RNG.randn(80, n_mel).astype(np.float32))
    chunks = mel_chunks_for_frames(mel, n, fps)
    assert chunks.shape == (n, 80, 16)
    np.testing.assert_allclose(
        np.asarray(chunks[3]), np.asarray(mel)[:, ref_starts[3] : ref_starts[3] + 16]
    )
