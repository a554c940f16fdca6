"""Multi-device tests on the 8-device virtual CPU mesh: PartialFC-style
class-sharded softmax, temporal halo exchange, frame sharding."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from s2v_tpu.parallel.halo import gather_windows, sharded_coeff_windows, smooth_boxes
from s2v_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_frames
from s2v_tpu.parallel.partial_fc import make_sharded_classifier, partial_fc_loss

RNG = np.random.RandomState(3)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(data_parallel=2, model_parallel=4)
    assert mesh2.shape == {"data": 2, "model": 4}


def test_frame_sharding_roundtrip():
    mesh = make_mesh()
    x = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
    xs = shard_frames(x, mesh)
    assert xs.sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def _reference_softmax_loss(features, labels, weight, margin_kind, s, m):
    """Unsharded reference computation."""
    wn = weight / np.linalg.norm(weight, axis=1, keepdims=True)
    logits = features @ wn.T
    onehot = np.eye(weight.shape[0])[labels]
    if margin_kind == "arcface":
        cos = np.clip(logits, -1 + 1e-7, 1 - 1e-7)
        theta = np.arccos(cos)
        logits = s * np.where(onehot > 0, np.cos(theta + m), cos)
    elif margin_kind == "cosface":
        logits = s * (logits - onehot * m)
    else:
        logits = logits * s
    logits = logits - logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return -np.mean(logp[np.arange(len(labels)), labels])


def test_partial_fc_matches_unsharded():
    mesh = make_mesh(data_parallel=1, model_parallel=8)
    b, e, c = 16, 32, 64  # 8 classes per shard
    feats = RNG.randn(b, e).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = RNG.randint(0, c, size=b).astype(np.int32)
    weight = RNG.randn(c, e).astype(np.float32)

    for margin in ["none", "cosface", "arcface"]:
        loss_fn, grad_fn = make_sharded_classifier(mesh, margin_kind=margin)
        w_sharded = jax.device_put(
            jnp.asarray(weight), NamedSharding(mesh, P(MODEL_AXIS, None))
        )
        got = float(loss_fn(jnp.asarray(feats), jnp.asarray(labels), w_sharded))
        want = _reference_softmax_loss(feats, labels, weight, margin, 64.0, 0.5)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_partial_fc_gradients_match_unsharded():
    mesh = make_mesh(data_parallel=1, model_parallel=8)
    b, e, c = 8, 16, 32
    feats = RNG.randn(b, e).astype(np.float32)
    labels = RNG.randint(0, c, size=b).astype(np.int32)
    weight = RNG.randn(c, e).astype(np.float32)

    loss_fn, grad_fn = make_sharded_classifier(mesh, margin_kind="cosface")
    w_sharded = jax.device_put(
        jnp.asarray(weight), NamedSharding(mesh, P(MODEL_AXIS, None))
    )
    gf, gw = grad_fn(jnp.asarray(feats), jnp.asarray(labels), w_sharded)

    # single-device reference via jax.grad on the same math, no sharding
    def ref_loss(feats, weight):
        wn = weight * jax.lax.rsqrt(
            jnp.sum(weight * weight, axis=1, keepdims=True) + 1e-12
        )
        logits = 64.0 * (feats @ wn.T - jax.nn.one_hot(labels, c) * 0.5)
        return jnp.mean(
            jnp.log(jnp.sum(jnp.exp(logits - logits.max(1, keepdims=True)), 1))
            - jnp.sum(
                (logits - logits.max(1, keepdims=True)) * jax.nn.one_hot(labels, c), 1
            )
        )

    rgf, rgw = jax.grad(ref_loss, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(weight)
    )
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rgf), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rgw), rtol=1e-3, atol=1e-4)


def test_partial_fc_sampling_rate_one_matches_full():
    """sample_rate=1.0 with an rng is the exact unsampled loss (all classes
    selected; sort restores identity order)."""
    mesh = make_mesh(data_parallel=1, model_parallel=8)
    b, e, c = 8, 16, 64
    feats = RNG.randn(b, e).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = RNG.randint(0, c, size=b).astype(np.int32)
    weight = RNG.randn(c, e).astype(np.float32)

    from functools import partial

    from jax import shard_map

    def run(rate):
        f = shard_map(
            lambda ft, lb, w: partial_fc_loss(
                ft, lb, w, margin_kind="cosface", sample_rate=rate,
                rng=jax.random.PRNGKey(0) if rate < 1 else None),
            mesh=mesh, in_specs=(P(), P(), P(MODEL_AXIS, None)),
            out_specs=P(),
        )
        w_sh = jax.device_put(jnp.asarray(weight),
                              NamedSharding(mesh, P(MODEL_AXIS, None)))
        return jax.jit(f)(jnp.asarray(feats), jnp.asarray(labels), w_sh)

    full = float(run(1.0))
    want = _reference_softmax_loss(feats, labels, weight, "cosface", 64.0, 0.5)
    np.testing.assert_allclose(full, want, rtol=2e-4, atol=2e-4)


def test_partial_fc_sampling_keeps_positives_and_sparsifies_grads():
    """PartialFC 0.25 sampling (partial_fc.py:100-123 analogue): positive
    classes always participate; weight gradients land only on sampled rows;
    the loss stays close to the full-softmax loss (smaller denominator)."""
    mesh = make_mesh(data_parallel=1, model_parallel=8)
    b, e, c = 8, 16, 128  # 16 classes/shard, 4 sampled/shard
    feats = RNG.randn(b, e).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = RNG.randint(0, c, size=b).astype(np.int32)
    weight = RNG.randn(c, e).astype(np.float32)

    from jax import shard_map

    def loss(ft, lb, w, rate):
        f = shard_map(
            lambda ft, lb, w: partial_fc_loss(
                ft, lb, w, margin_kind="cosface", sample_rate=rate,
                rng=jax.random.PRNGKey(7)),
            mesh=mesh, in_specs=(P(), P(), P(MODEL_AXIS, None)),
            out_specs=P(),
        )
        return f(ft, lb, w)

    w_sh = jax.device_put(jnp.asarray(weight),
                          NamedSharding(mesh, P(MODEL_AXIS, None)))
    sampled = float(jax.jit(lambda f, l, w: loss(f, l, w, 0.25))(
        jnp.asarray(feats), jnp.asarray(labels), w_sh))
    full = _reference_softmax_loss(feats, labels, weight, "cosface", 64.0, 0.5)
    # same target logits, denominator over a subset of the negatives:
    # strictly smaller log-sum-exp, still a positive CE at random init
    assert sampled <= full + 1e-3
    assert sampled > 0.0

    gw = jax.jit(jax.grad(lambda f, l, w: loss(f, l, w, 0.25), argnums=2))(
        jnp.asarray(feats), jnp.asarray(labels), w_sh)
    gw = np.asarray(gw)
    rows_nonzero = np.abs(gw).sum(axis=1) > 0
    # at most num_sample rows per shard carry gradient
    assert rows_nonzero.sum() <= 8 * 4
    # every positive class row carries gradient
    assert rows_nonzero[np.unique(labels)].all()


def test_gather_windows_matches_reference_clipping():
    """obtain_seq_index (inference_utils.py:73-76): clip(i+k-13, 0, N-1)."""
    n, c = 10, 4
    x = jnp.asarray(RNG.randn(n, c).astype(np.float32))
    win = gather_windows(x, 27)
    assert win.shape == (n, 27, c)
    # frame 0's window: 13 clamped copies of frame 0 then 0..13
    np.testing.assert_array_equal(np.asarray(win[0, 0]), np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(win[0, 13]), np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(win[0, 14]), np.asarray(x[1]))
    np.testing.assert_array_equal(np.asarray(win[-1, -1]), np.asarray(x[-1]))


def test_sharded_coeff_windows_matches_single_device():
    mesh = make_mesh()  # 8-way data parallel
    n, c = 32, 73
    coeffs = jnp.asarray(RNG.randn(n, c).astype(np.float32))
    want = np.asarray(gather_windows(coeffs, 27))
    got = np.asarray(sharded_coeff_windows(shard_frames(coeffs, mesh), 27, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_smooth_boxes_matches_reference():
    """get_smoothened_boxes (inference_utils.py:101-108) — which operates
    IN PLACE, so tail windows read already-smoothed rows."""
    boxes = RNG.rand(11, 4).astype(np.float32) * 100

    want = boxes.copy()
    T = 5
    for i in range(len(want)):
        if i + T > len(want):
            window = want[len(want) - T :]
        else:
            window = want[i : i + T]
        want[i] = np.mean(window, axis=0)

    got = np.asarray(smooth_boxes(jnp.asarray(boxes), 5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
