"""Artifact writer: image grids, wavs, loss curves."""

import os

import numpy as np

from s2v_tpu.utils.artifacts import ArtifactWriter

RNG = np.random.RandomState(301)


def test_image_grid(tmp_path):
    w = ArtifactWriter(str(tmp_path), every=100)
    assert w.should_write(200) and not w.should_write(150)
    imgs = RNG.rand(6, 16, 20, 3).astype(np.float32)
    path = w.image_grid(200, "samples", imgs, ncol=3)
    from PIL import Image

    grid = np.asarray(Image.open(path))
    assert grid.shape == (2 * 16, 3 * 20, 3)


def test_audio_and_curves(tmp_path):
    w = ArtifactWriter(str(tmp_path))
    t = np.arange(1600) / 16000
    path = w.audio(100, "probe", np.sin(2 * np.pi * 440 * t))
    assert os.path.getsize(path) > 3000

    for step in range(0, 100, 10):
        w.scalars(step, {"loss": 1.0 / (step + 1), "l1": 0.5})
    html = w.curves()
    content = open(html).read()
    assert "<svg" in content and "loss" in content
    assert os.path.isfile(html.replace(".html", ".json"))


def test_webpage_dashboard(tmp_path):
    """index.html dashboard: curves link + per-step image galleries
    (face3d/util/visualizer.py webpage equivalent)."""
    w = ArtifactWriter(str(tmp_path), every=1)
    w.scalars(1, {"loss": 1.0})
    w.scalars(2, {"loss": 0.5})
    w.image_grid(2, "fakes", np.random.rand(4, 8, 8, 3))
    w.audio(2, "sample", np.zeros(160), 16000)
    path = w.webpage("exp-1")
    html = open(path).read()
    assert "curves.html" in html and "step_00000002" in html
    assert "fakes.png" in html and "sample.wav" in html
    assert os.path.exists(os.path.join(str(tmp_path), "curves.html"))
