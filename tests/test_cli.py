"""CLI argument parsing (the reference's options() surface)."""

import pytest

from s2v_tpu.cli import parse_args


def test_flat_flag_remap_and_dotted_keys():
    cfg = parse_args(["--face", "a.mp4", "--fps", "30",
                      "--train.epochs", "3", "--static"])
    assert cfg.infer.face == "a.mp4"
    assert cfg.infer.fps == 30.0
    assert cfg.train.epochs == 3
    assert cfg.infer.static is True


def test_tuple_flags_nargs_style():
    cfg = parse_args(["--box", "-1", "-1", "-1", "-1",
                      "--pads", "0", "10", "0", "0",
                      "--crop", "4", "-1", "4", "-1"])
    assert cfg.infer.box == (-1, -1, -1, -1)
    assert cfg.infer.pads == (0, 10, 0, 0)
    assert cfg.infer.crop == (4, -1, 4, -1)


def test_unknown_flag_errors():
    with pytest.raises(SystemExit):
        parse_args(["--no_such_flag", "x"])


def test_config_file_then_flag_override(tmp_path):
    y = tmp_path / "c.yml"
    y.write_text("infer:\n  fps: 24.0\n  one_shot: true\n")
    cfg = parse_args(["--config", str(y), "--fps", "60"])
    assert cfg.infer.one_shot is True  # from file
    assert cfg.infer.fps == 60.0       # explicit flag wins


def test_find_audio_command(tmp_path, capsys):
    """find-audio (inference.py:414-468): nearest-DTW database wav, cached
    per clip basename."""
    import wave

    import numpy as np

    from s2v_tpu.cli import main

    for name, f0 in [("a.wav", 220), ("b.wav", 440), ("src.wav", 225)]:
        t = np.arange(4000) / 16000.0
        pcm = (np.sin(2 * np.pi * f0 * t) * 0.4 * 32767).astype(np.int16)
        with wave.open(str(tmp_path / name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())

    args = ["find-audio", "--face", "clip.mp4",
            "--audio", str(tmp_path / "src.wav"),
            "--tmp_dir", str(tmp_path / "tmp")]
    main(args)
    out = capsys.readouterr().out
    assert "best_audio:" in out and "a.wav" in out
    main(args)  # cached path
    out2 = capsys.readouterr().out
    assert "a.wav" in out2 and "distance" not in out2
