from s2v_tpu.audio.melspec import (  # noqa: F401
    mel_chunks_for_frames,
    melspectrogram,
    preemphasis,
    stft_magnitude,
)
