"""Dataset-preparation tooling (reference: preprocessing/{video2audio,
audio2codes,normalized_text}.py).

- ``video_to_audio``: mp4 -> wav (the reference uses moviepy; here ffmpeg
  via s2v_tpu.io, or a clear error without codecs).
- ``normalize_text``: MFA text cleanup — strip the speaker header before
  the first ':' and keep only the first line (normalized_text.py:12-20).
- ``audio_to_codes``: per-video-frame EnCodec discrete codes with the
  reference's windowing (audio2codes.py:34-56: 0.2 s window starting at each
  frame, (1, 32, 15) codes at bandwidth 24). The quantizer is pluggable: an
  EnCodec-compatible ``codec`` object with .sample_rate/.channels/.encode —
  the `encodec` package when installed, or any JAX RVQ codec implementing
  the protocol. This environment ships neither torch-audio decoding nor the
  encodec weights, so the function degrades with a clear error.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Optional

import numpy as np


def video_to_audio(path: str, outdir: Optional[str] = None) -> str:
    """mp4 -> 16-bit wav next to the video (video2audio.py:13-19)."""
    import shutil
    import subprocess

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            "video_to_audio requires an ffmpeg binary (the reference uses "
            "moviepy, which also wraps ffmpeg)."
        )
    out = (os.path.join(outdir, os.path.basename(path))
           if outdir else path)[:-3] + "wav"
    subprocess.run(
        [ffmpeg, "-loglevel", "error", "-y", "-i", path, "-vn", out],
        check=True,
    )
    return out


def remove_header(text: str) -> str:
    """normalized_text.py:12-13."""
    return "".join(text.split(":")[1:])


def remove_footer(text: str) -> str:
    """normalized_text.py:15-20."""
    lines = text.splitlines()
    if not lines:
        raise ValueError("empty text after header removal")
    return "".join(lines[0])


def normalize_text(text: str) -> str:
    return remove_footer(remove_header(text))


def normalize_text_file(path: str, outdir: Optional[str] = None) -> str:
    with open(path, "r", encoding="utf-8") as f:
        text = normalize_text(f.read())
    out = os.path.join(outdir, os.path.basename(path)) if outdir else path
    with open(out, "w") as f:
        f.write(text)
    return out


def frame_windows(wav: np.ndarray, sr: int, n_frames: int, fps: float,
                  window_s: float = 0.2) -> np.ndarray:
    """audio2codes.py:41-48: zero-pad 0.1 s both sides, then one
    ``window_s`` chunk starting at each video frame. [N, window]."""
    nr = int(window_s / 2 * sr)
    wav = np.pad(wav, (nr, nr))
    idx_multiplier = int(1.0 / fps * sr)
    out = np.zeros((n_frames, 2 * nr), wav.dtype)
    for i in range(n_frames):
        chunk = wav[i * idx_multiplier : i * idx_multiplier + 2 * nr]
        out[i, : len(chunk)] = chunk
    return out


def audio_to_codes(wav: np.ndarray, sr: int, n_frames: int, fps: float,
                   codec=None) -> np.ndarray:
    """Per-frame discrete codes [N, n_q, T] (audio2codes.py:34-56)."""
    if codec is None:
        try:
            from encodec import EncodecModel

            codec = EncodecModel.encodec_model_24khz()
            codec.set_target_bandwidth(24.0)
        except ImportError as e:
            raise RuntimeError(
                "audio_to_codes needs a codec: install `encodec` or pass a "
                "codec object (sample_rate/channels/encode protocol)."
            ) from e
    windows = frame_windows(wav, sr, n_frames, fps)
    codes = []
    for chunk in windows:
        codes.append(np.asarray(codec_encode(codec, chunk, sr)))
    return np.stack(codes)


def codec_encode(codec, chunk: np.ndarray, sr: int) -> np.ndarray:
    """Encode one mono window with an EnCodec-style codec."""
    import importlib

    if hasattr(codec, "encode_numpy"):
        return codec.encode_numpy(chunk, sr)
    torch = importlib.import_module("torch")
    convert_audio = importlib.import_module("encodec.utils").convert_audio
    t = torch.from_numpy(chunk[None].astype(np.float32))
    t = convert_audio(t, sr, codec.sample_rate, codec.channels)[None]
    with torch.no_grad():
        frames = codec.encode(t)
    return torch.cat([f[0] for f in frames], dim=-1)[0].numpy()
