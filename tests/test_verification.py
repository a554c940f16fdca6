"""Verification eval parity vs the reference's per-threshold loops."""

import numpy as np

import jax.numpy as jnp

from s2v_tpu.train.verification import (
    VerificationCallback,
    calculate_accuracy,
    calculate_roc,
    evaluate,
    extract_embeddings,
)

RNG = np.random.RandomState(191)


def reference_roc(thresholds, emb1, emb2, issame, nrof_folds=10):
    """verification.py:54-106 reimplemented literally."""
    n = min(len(issame), emb1.shape[0])
    dist = np.sum(np.square(emb1 - emb2), 1)[:n]
    issame = np.asarray(issame[:n], bool)
    sizes = np.full(nrof_folds, n // nrof_folds)
    sizes[: n % nrof_folds] += 1
    edges = np.concatenate([[0], np.cumsum(sizes)])
    accuracy = np.zeros(nrof_folds)
    for fold in range(nrof_folds):
        test = np.arange(edges[fold], edges[fold + 1])
        train = np.concatenate([
            np.arange(0, edges[fold]), np.arange(edges[fold + 1], n)
        ])
        accs = np.zeros(len(thresholds))
        for t, thr in enumerate(thresholds):
            _, _, accs[t] = calculate_accuracy(thr, dist[train], issame[train])
        best = np.argmax(accs)
        _, _, accuracy[fold] = calculate_accuracy(
            thresholds[best], dist[test], issame[test]
        )
    return accuracy


def test_roc_matches_reference_loop():
    n, e = 120, 16
    same = RNG.rand(n) > 0.5
    base = RNG.randn(n, e)
    emb1 = base + RNG.randn(n, e) * 0.1
    emb2 = np.where(same[:, None], base + RNG.randn(n, e) * 0.1,
                    RNG.randn(n, e))
    emb1 /= np.linalg.norm(emb1, axis=1, keepdims=True)
    emb2 /= np.linalg.norm(emb2, axis=1, keepdims=True)
    thresholds = np.arange(0, 4, 0.01)
    want = reference_roc(thresholds, emb1, emb2, same)
    _, _, got = calculate_roc(thresholds, emb1, emb2, same)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # separable embeddings verify well
    acc, std = evaluate(
        np.stack([emb1, emb2], 1).reshape(-1, e), same
    )
    assert acc > 0.7


def test_extract_embeddings_and_callback():
    def embed_fn(x):  # fake embedder: channel means
        return jnp.mean(x, axis=(1, 2))

    images = RNG.rand(10, 8, 8, 4).astype(np.float32)
    emb = extract_embeddings(embed_fn, images, batch=4, flip=True)
    assert emb.shape == (10, 4)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)

    cb = VerificationCallback(images, RNG.rand(5) > 0.5, frequent=2)
    assert cb(1, embed_fn) is None
    rec = cb(2, embed_fn)
    assert rec is not None and "val_acc" in rec


def test_ijbc_template_pooling_and_tar():
    from s2v_tpu.train.verification import (
        image2template_feature,
        tar_at_far,
        template_verification_scores,
    )

    e = 8
    # two identities, two templates each; videos (media) pooled first
    ids = {10: RNG.randn(e), 20: RNG.randn(e)}
    feats, templates, medias = [], [], []
    for t, ident, media_list in [(10, 10, [0, 0, 1]), (11, 10, [2]),
                                 (20, 20, [3, 4]), (21, 20, [5, 5, 5])]:
        for m in media_list:
            feats.append(ids[ident] + RNG.randn(e) * 0.05)
            templates.append(t)
            medias.append(m)
    feats = np.asarray(feats)
    templates = np.asarray(templates)
    medias = np.asarray(medias)

    tf, uq = image2template_feature(feats, templates, medias)
    assert tf.shape == (4, e)
    np.testing.assert_allclose(np.linalg.norm(tf, axis=1), 1.0, rtol=1e-6)

    p1 = np.asarray([10, 10, 20, 10])
    p2 = np.asarray([11, 20, 21, 21])
    labels = np.asarray([1, 0, 1, 0], bool)
    scores = template_verification_scores(tf, uq, p1, p2)
    # same-identity template pairs score higher
    assert scores[labels].min() > scores[~labels].max()

    big_scores = np.concatenate([RNG.randn(1000) + 3, RNG.randn(1000)])
    big_labels = np.concatenate([np.ones(1000, bool), np.zeros(1000, bool)])
    tars = tar_at_far(big_scores, big_labels, far_targets=(1e-2, 1e-1))
    assert 0.9 < tars[1e-1] <= 1.0
    assert tars[1e-2] <= tars[1e-1]
