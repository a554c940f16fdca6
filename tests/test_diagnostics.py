

def test_diagnostic_stats_and_csv(tmp_path):
    import numpy as np

    from s2v_tpu.utils.diagnostics import Diagnostic

    d = Diagnostic("t")
    x = np.arange(12, dtype=np.float32).reshape(3, 4) - 5
    d.accumulate("layer", x)
    rows = {r["name"]: r for r in d.rows()}
    r = rows["layer/axis_1/"] if "layer/axis_1/" in rows else rows["layer/axis_1"]
    assert r["size"] == 4 and r["count"] == 3
    np.testing.assert_allclose(r["val"], x.mean(), rtol=1e-6)
    np.testing.assert_allclose(r["min"], x.min())
    np.testing.assert_allclose(r["max"], x.max())
    np.testing.assert_allclose(
        r["rms"], np.mean(np.sqrt(np.mean(x * x, 0))), rtol=1e-6)
    assert r["pca"] > 0  # singular values accumulated

    path = d.to_csv(str(tmp_path / "diag.csv"))
    import csv

    with open(path) as f:
        got = list(csv.DictReader(f))
    assert len(got) == len(rows)


def test_capture_activations_hook_analogue():
    import flax.linen as nn
    import numpy as np

    from s2v_tpu.utils.diagnostics import Diagnostic, capture_activations

    import jax
    import jax.numpy as jnp

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(8, name="fc1")(x)
            return nn.Dense(2, name="fc2")(jax.nn.relu(x))

    m = Tiny()
    x = jnp.asarray(np.random.RandomState(0).rand(4, 3).astype(np.float32))
    var = m.init(jax.random.PRNGKey(0), x)
    out, acts = capture_activations(m, var, x)
    assert out.shape == (4, 2)

    d = Diagnostic()
    d.accumulate_tree(acts, kind="output")
    d.accumulate_tree(var["params"], kind="param")
    names = [r["name"] for r in d.rows()]
    assert any("fc1" in n and "output" in n for n in names)
    assert any("fc2" in n and "param" in n for n in names)


def test_detect_boxes_oom_backoff(monkeypatch):
    """The face_detect OOM backoff halves the batch and restarts."""
    import numpy as np

    from s2v_tpu.pipeline.inference import LipSyncPipeline, PipelineModels
    from s2v_tpu.utils.config import PipelineConfig

    pipe = LipSyncPipeline(PipelineConfig(), PipelineModels(s3fd={}))
    calls = []

    def fake_run(variables, chunk):
        calls.append(chunk.shape[0])
        if chunk.shape[0] > 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory on fake TPU")
        n = chunk.shape[0]
        return (np.tile([1.0, 2.0, 30.0, 40.0], (n, 1)),
                np.ones(n, bool))

    monkeypatch.setattr(pipe, "_detect_fn", lambda: fake_run)
    boxes = pipe.detect_boxes(np.zeros((5, 16, 16, 3), np.uint8), batch=8)
    assert boxes.shape == (5, 4)
    assert calls[0] == 8 and calls[1] == 4 and 2 in calls  # 8 -> 4 -> 2


def test_embedding_scatter_artifact(tmp_path):
    import numpy as np

    from s2v_tpu.utils.artifacts import ArtifactWriter

    w = ArtifactWriter(str(tmp_path))
    emb = np.random.RandomState(0).randn(20, 8)
    path = w.embedding_scatter(100, "emb", emb, labels=[i % 3 for i in range(20)])
    svg = open(path).read()
    assert svg.count("<circle") == 20 and svg.startswith("<svg")
