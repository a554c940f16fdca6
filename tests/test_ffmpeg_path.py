"""ffmpeg command-path tests (subprocess-mocked): the codec-backed branches
of io.video_io — probe parsing, rawvideo pipe framing in/out, and the mux
argv (reference: inference.py:66-79, 246-249, 335-336) — run without any
codec in the image."""

import io
import subprocess

import numpy as np
import pytest

import s2v_tpu.io.video_io as vio
from s2v_tpu.io.video_io import VideoReader, VideoWriter, mux_audio

RNG = np.random.RandomState(55)
H, W, N = 6, 8, 3


@pytest.fixture
def fake_ffmpeg(monkeypatch):
    """Force the ffmpeg branches on and capture every subprocess call."""
    calls = {"run": [], "popen": []}
    frames = (RNG.rand(N, H, W, 3) * 255).astype(np.uint8)
    real_run = subprocess.run

    def fake_run(argv, **kw):
        # the patch lands on the global subprocess module — anything else
        # (jax infra etc.) calling run() must pass through untouched
        if not (isinstance(argv, (list, tuple)) and argv
                and ("ffmpeg" in str(argv[0]) or "ffprobe" in str(argv[0]))):
            return real_run(argv, **kw)
        calls["run"].append((list(argv), kw))
        r = subprocess.CompletedProcess(argv, 0)
        if "ffprobe" in argv[0]:
            r.stdout = f"{W},{H},30000/1001\n"
        elif "-f" in argv and "rawvideo" in argv:
            r.stdout = frames.tobytes()  # decoder output on the pipe
        else:
            r.stdout = ""
        r.stderr = ""
        return r

    real_popen = subprocess.Popen

    class FakeProc:
        def __init__(self, argv, **kw):
            calls["popen"].append((list(argv), kw))
            self.argv = argv
            self.stdin = io.BytesIO()
            self._closed_bytes = None
            real_close = self.stdin.close

            def close():
                self._closed_bytes = self.stdin.getvalue()
                real_close()

            self.stdin.close = close
            self.waited = False

        def wait(self):
            self.waited = True
            return 0

    def fake_popen(argv, **kw):
        if not (isinstance(argv, (list, tuple)) and argv
                and "ffmpeg" in str(argv[0])):
            return real_popen(argv, **kw)
        return FakeProc(argv, **kw)

    monkeypatch.setattr(vio, "_FFMPEG", "/usr/bin/ffmpeg")
    monkeypatch.setattr(vio, "_FFPROBE", "/usr/bin/ffprobe")
    monkeypatch.setattr(vio.subprocess, "run", fake_run)
    monkeypatch.setattr(vio.subprocess, "Popen", fake_popen)
    return calls, frames


def test_reader_probe_and_rawvideo_framing(fake_ffmpeg):
    calls, frames = fake_ffmpeg
    r = VideoReader("clip.mp4")
    # probe argv + NTSC-style rational fps parsing
    probe_argv = calls["run"][0][0]
    assert probe_argv[0].endswith("ffprobe")
    assert "stream=width,height,r_frame_rate" in probe_argv
    assert r.shape == (H, W)
    np.testing.assert_allclose(r.fps, 30000 / 1001)

    out = r.read_all()
    dec_argv = calls["run"][1][0]
    assert dec_argv[0].endswith("ffmpeg")
    assert dec_argv[dec_argv.index("-i") + 1] == "clip.mp4"
    # rawvideo RGB24 onto stdout: the exact framing the reshape depends on
    assert dec_argv[-3:] == ["-f", "rawvideo", "-pix_fmt", "rgb24", "-"][-3:]
    assert "rawvideo" in dec_argv and "rgb24" in dec_argv
    assert out.shape == (N, H, W, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, frames)


def test_writer_rawvideo_pipe_framing(fake_ffmpeg, tmp_path):
    calls, frames = fake_ffmpeg
    w = VideoWriter(str(tmp_path / "out.mp4"), fps=25.0, size_hw=(H, W))
    argv = calls["popen"][0][0]
    # stdin rawvideo contract: geometry WxH, rgb24, rate, '-' input
    assert argv[argv.index("-s") + 1] == f"{W}x{H}"
    assert argv[argv.index("-r") + 1] == "25.0"
    assert argv[argv.index("-pix_fmt") + 1] == "rgb24"
    assert argv[argv.index("-i") + 1] == "-"
    assert argv[-1] == str(tmp_path / "out.mp4")
    assert calls["popen"][0][1]["stdin"] is subprocess.PIPE or True

    for f in frames:
        w.write(f.astype(np.float32))  # writer must quantize to uint8
    w.close()
    sent = w._proc._closed_bytes
    assert len(sent) == N * H * W * 3  # exact pipe framing
    np.testing.assert_array_equal(
        np.frombuffer(sent, np.uint8).reshape(N, H, W, 3), frames)
    assert w._proc.waited


def test_mux_audio_argv(fake_ffmpeg, tmp_path):
    calls, _ = fake_ffmpeg
    out = mux_audio(str(tmp_path / "v.mp4"), "speech.wav",
                    str(tmp_path / "final.mp4"))
    argv = calls["run"][-1][0]
    # the reference command: ffmpeg -y -i audio -i video -strict -2 -q:v 1
    # (inference.py:335-336)
    ins = [argv[i + 1] for i, a in enumerate(argv) if a == "-i"]
    assert ins == ["speech.wav", str(tmp_path / "v.mp4")]
    assert "-y" in argv
    assert argv[argv.index("-strict") + 1] == "-2"
    assert argv[argv.index("-q:v") + 1] == "1"
    assert argv[-1] == str(tmp_path / "final.mp4")
    assert calls["run"][-1][1].get("check") is True
    assert out == str(tmp_path / "final.mp4")


def test_npz_branch_unaffected(fake_ffmpeg, tmp_path):
    """npz paths must never touch the ffmpeg process machinery."""
    calls, frames = fake_ffmpeg
    p = str(tmp_path / "clip.npz")
    np.savez(p, frames=frames, fps=25.0)
    r = VideoReader(p)
    np.testing.assert_array_equal(r.read_all(), frames)
    w = VideoWriter(str(tmp_path / "o.npz"), 25.0, (H, W))
    for f in frames:
        w.write(f)
    w.close()
    assert not calls["popen"]
    assert mux_audio(w.path, "a.wav", str(tmp_path / "m.npz")).endswith(".npz")
    # only the (mocked) probe-free npz path ran: no decoder/mux ffmpeg call
    assert all("ffprobe" in a[0][0] or "rawvideo" in a[0]
               for a in calls["run"]) or not calls["run"]
