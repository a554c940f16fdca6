

def test_load_config_file_yaml_json_py(tmp_path):
    from s2v_tpu.utils.config import PipelineConfig, load_config_file

    y = tmp_path / "c.yml"
    y.write_text("infer:\n  fps: 30.0\n  static: true\n"
                 "  box: [20, 120, 30, 110]\naudio:\n  num_mels: 40\n")
    cfg = load_config_file(str(y))
    assert cfg.infer.fps == 30.0 and cfg.infer.static is True
    assert cfg.infer.box == (20, 120, 30, 110)
    assert cfg.audio.num_mels == 40

    j = tmp_path / "c.json"
    j.write_text('{"infer": {"lnet_batch_size": 4}}')
    cfg = load_config_file(str(j), base=cfg)
    assert cfg.infer.lnet_batch_size == 4 and cfg.infer.fps == 30.0

    p = tmp_path / "c.py"
    p.write_text("config = {'train': {'epochs': 7}}\n")
    cfg = load_config_file(str(p), base=cfg)
    assert cfg.train.epochs == 7

    import pytest

    bad = tmp_path / "c.txt"
    bad.write_text("x")
    with pytest.raises(ValueError):
        load_config_file(str(bad))
