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
