"""face3d training step with synthetic BFM bases + rasterizer in the loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2v_tpu.models.bfm import ParametricFaceModel
from s2v_tpu.train.face3d_train import make_face3d_train_step
from tests.test_bfm import synthetic_model

RNG = np.random.RandomState(271)


@pytest.mark.slow
def test_face3d_train_step_runs():
    data = synthetic_model(n_verts=30, n_faces=40)
    fm = ParametricFaceModel(data, focal=100.0, center=16.0)
    init_fn, step_fn = make_face3d_train_step(
        fm, skin_mask=np.ones(30, np.float32), image_size=32
    )
    state = init_fn(jax.random.PRNGKey(0))
    batch = {
        "image": jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32)),
        "gt_lm": jnp.asarray(RNG.rand(2, 68, 2).astype(np.float32) * 32),
        "mask": jnp.ones((2, 32, 32, 1)),
    }
    state, metrics = step_fn(state, batch)
    assert int(state["step"]) == 1
    for k in ("color", "lm", "reg", "gamma", "reflc", "loss"):
        assert np.isfinite(float(metrics[k])), k
    state2, m2 = step_fn(state, batch)
    assert np.isfinite(float(m2["loss"]))
