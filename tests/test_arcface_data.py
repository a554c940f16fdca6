"""Arcface record-file reader tests: RecordIO container round-trip,
MXFaceDataset semantics, DistributedSampler sharding, and a 2-step train
from files on the 8-device mesh (reference: arcface_torch/dataset.py:70-107,
train.py:37-45)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2v_tpu.train.arcface_data import (
    ArcFaceRecordDataset,
    RecordFile,
    epoch_indices,
    record_batches,
    write_record_file,
    write_synthetic_pack,
)


def test_recordio_roundtrip(tmp_path):
    prefix = str(tmp_path / "pack")
    payloads = [b"alpha", b"bravo-longer-payload", b""]
    write_record_file(prefix, [
        (0, np.asarray([7.0, 11.0, 13.0], np.float32), payloads[0]),
        (1, 3.0, payloads[1]),
        (5, 4.0, payloads[2]),  # sparse keys allowed
    ])
    rec = RecordFile(prefix)
    assert rec.keys == [0, 1, 5]
    flag, label, data = rec.read_idx(0)
    assert flag == 3
    np.testing.assert_allclose(label, [7.0, 11.0, 13.0])
    assert data == payloads[0]
    flag, label, data = rec.read_idx(1)
    assert flag == 0 and label == 3.0 and data == payloads[1]
    flag, label, data = rec.read_idx(5)
    assert data == payloads[2]
    rec.close()


def test_synthetic_pack_dataset(tmp_path):
    root = write_synthetic_pack(str(tmp_path), num_identities=5,
                                per_identity=3)
    ds = ArcFaceRecordDataset(root)
    assert len(ds) == 15
    assert ds.num_classes == 5
    img, label = ds[0]
    assert img.shape == (112, 112, 3) and img.dtype == np.uint8
    labels = [ds[i][1] for i in range(len(ds))]
    assert labels == [i % 5 for i in range(15)]


def test_epoch_indices_distributed_sampler_semantics():
    n, world = 103, 8
    shards = [epoch_indices(n, epoch=2, index=r, count=world)
              for r in range(world)]
    sizes = {len(s) for s in shards}
    assert sizes == {int(np.ceil(n / world))}  # equal per-rank length
    union = np.concatenate(shards)
    assert set(union.tolist()) == set(range(n))  # full coverage (with pad)
    # epochs reshuffle deterministically
    a = epoch_indices(n, epoch=0, index=0, count=world)
    b = epoch_indices(n, epoch=1, index=0, count=world)
    c = epoch_indices(n, epoch=0, index=0, count=world)
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(a, c)
    # no shuffle keeps natural order
    d = epoch_indices(10, epoch=0, index=0, count=2, shuffle=False)
    np.testing.assert_array_equal(d, [0, 2, 4, 6, 8])


def test_record_batches_shapes_and_host_sharding(tmp_path):
    root = write_synthetic_pack(str(tmp_path), num_identities=4,
                                per_identity=8)
    ds = ArcFaceRecordDataset(root)
    seen = []
    for r in range(2):
        for imgs, labels in record_batches(ds, batch_size=8, index=r,
                                           count=2, hflip=False,
                                           prefetch=2):
            assert imgs.shape == (8, 112, 112, 3)
            assert imgs.dtype == np.float32
            assert imgs.min() >= -1.0 and imgs.max() <= 1.0
            assert labels.dtype == np.int32
            seen.append(labels)
    assert len(seen) == 4  # 32 imgs / 2 hosts / batch 8
    assert all(0 <= l < 4 for l in np.concatenate(seen))


@pytest.mark.slow
def test_train_two_steps_from_files(tmp_path):
    """The reference's train loop start (train.py:107-131): dataset ->
    sampler -> batches -> backbone+PartialFC steps, on the 4x2 mesh."""
    from s2v_tpu.parallel.mesh import make_mesh
    from s2v_tpu.train.arcface import make_arcface_trainer

    root = write_synthetic_pack(str(tmp_path), num_identities=8,
                                per_identity=4)
    ds = ArcFaceRecordDataset(root)
    mesh = make_mesh(4, 2)
    state, step = make_arcface_trainer(
        mesh, num_classes=ds.num_classes, embedding_size=32,
        layers=(1, 1, 1, 1))
    losses = []
    with mesh:
        for imgs, labels in record_batches(ds, batch_size=8, epoch=0,
                                           index=0, count=2):
            state, m = step(state, jnp.asarray(imgs), jnp.asarray(labels))
            losses.append(float(m["loss"]))
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
    assert int(state.step) == 2
