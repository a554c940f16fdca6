"""Mel-spectrogram frontend (reference: futils/audio.py:20-123).

Pipeline per the reference, with librosa==0.9.2 conventions:

  wav -> preemphasis(0.97) -> STFT(n_fft=800, hop=200, win=800, periodic hann,
  center=True, reflect padding) -> |.| -> mel(80, slaney) -> 20*log10 ->
  -ref_level_db -> symmetric +-4 normalize

TPU-first design: the STFT is framing (a static-shape reshape/gather) followed
by a windowed projection onto the rFFT basis. For n_fft=800 we express the DFT
as a dense [800, 2*401] real matmul — 800 is not a power of two, XLA's FFT on
TPU is weak for such sizes, and the matmul form runs on the MXU and fuses with
the mel projection: mel = |W_dft @ frames| @ M^T becomes two back-to-back
matmuls per clip. The whole frontend jit-compiles to one fused program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from s2v_tpu.audio.filters import hann_window, mel_filterbank
from s2v_tpu.utils.config import AudioConfig


def preemphasis(wav: jnp.ndarray, k: float = 0.97) -> jnp.ndarray:
    """y[n] = x[n] - k*x[n-1], y[0] = x[0] (scipy lfilter([1,-k],[1],x))."""
    return jnp.concatenate([wav[:1], wav[1:] - k * wav[:-1]])


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int, win_size: int) -> np.ndarray:
    """[win_size, 2*(n_fft//2+1)] windowed real-DFT basis (cos | -sin)."""
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    window = hann_window(win_size).astype(np.float64)
    if win_size < n_fft:
        pad = (n_fft - win_size) // 2
        window = np.pad(window, (pad, n_fft - win_size - pad))
    return (basis * window[:, None]).astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-padded (reflect) framing: [T] -> [n_frames, n_fft]."""
    y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return y[idx]


def stft_magnitude(y: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """|STFT(y)| as [n_frames, n_fft//2+1] (librosa 0.9.2 semantics)."""
    frames = frame_signal(y, cfg.n_fft, cfg.hop_size)
    basis = jnp.asarray(_dft_basis(cfg.n_fft, cfg.win_size))
    # HIGHEST: keep full f32 accumulation on the MXU (default TPU matmul
    # precision is bf16 inputs, too coarse for an 800-tap DFT).
    proj = jnp.matmul(frames, basis, precision=jax.lax.Precision.HIGHEST)
    n_freq = cfg.n_freq
    re, im = proj[:, :n_freq], proj[:, n_freq:]
    return jnp.sqrt(re * re + im * im)


def _amp_to_db(x: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    min_level = np.exp(min_level_db / 20.0 * np.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def _normalize(s: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    if not cfg.signal_normalization:
        return s
    scaled = (s - cfg.min_level_db) / (-cfg.min_level_db)
    if cfg.symmetric_mels:
        out = 2.0 * cfg.max_abs_value * scaled - cfg.max_abs_value
        lo, hi = -cfg.max_abs_value, cfg.max_abs_value
    else:
        out = cfg.max_abs_value * scaled
        lo, hi = 0.0, cfg.max_abs_value
    if cfg.allow_clipping_in_normalization:
        out = jnp.clip(out, lo, hi)
    return out


@functools.partial(jax.jit, static_argnames="cfg")
def melspectrogram(wav: jnp.ndarray, cfg: AudioConfig = AudioConfig()) -> jnp.ndarray:
    """wav [T] float32 in [-1, 1] -> mel [num_mels, n_frames] in [-4, 4].

    Matches futils/audio.py:45-51 (melspectrogram) bit-for-bit up to float
    associativity.
    """
    if wav.ndim != 1:
        raise ValueError(f"melspectrogram expects a mono [T] waveform, got {wav.shape}")
    if cfg.preemphasize:
        wav = preemphasis(wav, cfg.preemphasis)
    mag = stft_magnitude(wav, cfg)  # [n_frames, n_freq]
    mel_basis = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)
    )
    mel = jnp.matmul(mag, mel_basis.T, precision=jax.lax.Precision.HIGHEST)
    s = _amp_to_db(mel, cfg.min_level_db) - cfg.ref_level_db
    return _normalize(s, cfg).T  # [num_mels, n_frames]


def mel_chunk_starts(n_mel_frames: int, n_video_frames: int, fps: float,
                     mel_step_size: int = 16) -> np.ndarray:
    """Start index of the 80x16 conditioning window for each video frame.

    Reference: inference.py:209-216 — stride 80/fps mel frames per video
    frame; windows that would run past the end are clamped to the last full
    window. Returns [n_video_frames] int32 starts (static, host-side).
    """
    mel_idx_multiplier = 80.0 / fps
    starts = []
    for i in range(n_video_frames):
        start = int(i * mel_idx_multiplier)
        if start + mel_step_size > n_mel_frames:
            start = n_mel_frames - mel_step_size
        starts.append(max(start, 0))
    return np.asarray(starts, dtype=np.int32)


def num_mel_chunks(n_mel_frames: int, fps: float, mel_step_size: int = 16) -> int:
    """Number of chunks the reference loop yields (inference.py:209-216)."""
    mel_idx_multiplier = 80.0 / fps
    i = 0
    while True:
        start = int(i * mel_idx_multiplier)
        if start + mel_step_size > n_mel_frames:
            return i + 1
        i += 1


def mel_chunks_for_frames(
    mel: jnp.ndarray, n_video_frames: int, fps: float, mel_step_size: int = 16
) -> jnp.ndarray:
    """Gather per-frame mel windows: [num_mels, T] -> [N, num_mels, step].

    The window starts are static given (T, N, fps), so this lowers to a
    static gather under jit.
    """
    starts = mel_chunk_starts(mel.shape[1], n_video_frames, fps, mel_step_size)
    idx = starts[:, None] + np.arange(mel_step_size)[None, :]  # [N, step]
    return jnp.transpose(mel[:, idx], (1, 0, 2))
