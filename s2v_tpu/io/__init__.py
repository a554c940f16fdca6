from s2v_tpu.io.audio_io import load_wav  # noqa: F401
from s2v_tpu.io.video_io import VideoReader, VideoWriter, mux_audio  # noqa: F401
