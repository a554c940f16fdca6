"""face3d data preparation: GMM skin mask vs the reference oracle and the
dataset-list builder (reference: third_part/face3d/data_preparation.py +
util/{skin_mask,generate_list}.py)."""

import importlib.util
import os
import sys
import types

import numpy as np

from s2v_tpu.prep.face3d_data import prepare_dataset, skin_mask

RNG = np.random.RandomState(13)


def _load_ref_skinmask():
    sys.modules.setdefault("cv2", types.ModuleType("cv2"))
    spec = importlib.util.spec_from_file_location(
        "ref_skin_mask", "/root/reference/third_part/face3d/util/skin_mask.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_skin_mask_matches_reference():
    ref = _load_ref_skinmask()
    img = (RNG.rand(24, 20, 3) * 255).astype(np.uint8)
    want = ref.skinmask(img[..., ::-1])[:, :, 0]  # reference takes BGR
    got = skin_mask(img)
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1


def test_prepare_dataset_writes_lists(tmp_path):
    from PIL import Image

    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(3):
        Image.fromarray(
            (RNG.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            folder / f"im{i}.png")

    def fake_landmarks(batch):
        return np.tile(np.linspace(0, 31, 68)[None, :, None], (len(batch), 1, 2))

    lms, imgs, msks = prepare_dataset(
        [str(folder)], fake_landmarks, mode="train",
        save_folder=str(tmp_path / "datalist"))
    assert len(lms) == len(imgs) == len(msks) == 3
    assert all(os.path.isfile(p) for p in lms + imgs + msks)
    listing = (tmp_path / "datalist" / "train" / "images.txt").read_text()
    assert listing.count("\n") == 3
    lm = np.loadtxt(lms[0])
    assert lm.shape == (68, 2)
