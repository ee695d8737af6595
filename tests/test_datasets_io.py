"""Dataset IO tests: CIFAR pickle format, ImageFolder, transforms."""
import os
import pickle

import numpy as np
import pytest

from slim_switch_moe_vit_tpu.data.datasets import (
    ArrayDataset, FolderDataset, _load_cifar,
)
from slim_switch_moe_vit_tpu.data.transforms import (
    EvalTransform, TrainTransform, random_resized_crop, resize_center_crop,
)


def _write_fake_cifar10(root):
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(1, 6):
        data = rs.randint(0, 256, (20, 3072), np.uint8)
        with open(os.path.join(base, f"data_batch_{i}"), "wb") as f:
            pickle.dump({b"data": data,
                         b"labels": rs.randint(0, 10, 20).tolist()}, f)
    with open(os.path.join(base, "test_batch"), "wb") as f:
        pickle.dump({b"data": rs.randint(0, 256, (10, 3072), np.uint8),
                     b"labels": rs.randint(0, 10, 10).tolist()}, f)


def test_cifar_pickle_loader(tmp_path):
    _write_fake_cifar10(str(tmp_path))
    x, y = _load_cifar(str(tmp_path), train=True, cifar100=False)
    assert x.shape == (100, 32, 32, 3) and x.dtype == np.uint8
    assert y.shape == (100,)
    x2, y2 = _load_cifar(str(tmp_path), train=False, cifar100=False)
    assert x2.shape == (10, 32, 32, 3)
    ds = ArrayDataset(x, y, transform=EvalTransform(32))
    img, t = ds[0]
    assert img.shape == (32, 32, 3) and 0 <= t < 10


def test_folder_dataset(tmp_path):
    from PIL import Image

    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                np.random.RandomState(i).randint(0, 255, (40, 50, 3),
                                                 np.uint8)
            ).save(d / f"{i}.png")
    ds = FolderDataset(str(tmp_path), transform=EvalTransform(32))
    assert len(ds) == 6
    assert ds.class_to_idx == {"cat": 0, "dog": 1}
    img, t = ds[0]
    assert img.shape == (32, 32, 3) and t == 0
    assert sorted(np.unique(ds.targets)) == [0, 1]


def test_random_resized_crop_shapes():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (300, 400, 3), np.uint8)
    out = random_resized_crop(img, 224, rs)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8


def test_resize_center_crop_geometry():
    img = np.zeros((300, 400, 3), np.uint8)
    img[:, 200:] = 255  # right half white (center crop keeps mid region)
    out = resize_center_crop(img, 224, 0.875)
    assert out.shape == (224, 224, 3)
    # left edge dark, right edge white
    assert out[:, :10].mean() < 50 and out[:, -10:].mean() > 200


def test_train_transform_small_image_uses_src():
    tr = TrainTransform(32)
    img = np.random.RandomState(0).randint(0, 256, (32, 32, 3), np.uint8)
    out = tr(img)
    assert out.shape == (32, 32, 3)


def test_synth_learnable_labels_match_blob():
    from slim_switch_moe_vit_tpu.data.datasets import SynthDataset

    ds = SynthDataset(32, 32, 4, learnable=True)
    for i in range(16):
        img, t = ds[i]
        s = 8
        bands = [img[b * s:(b + 1) * s].mean() for b in range(4)]
        assert int(np.argmax(bands)) == t
        # flip invariance: mirrored image keeps the same label feature
        flipped = img[:, ::-1]
        bands_f = [flipped[b * s:(b + 1) * s].mean() for b in range(4)]
        assert int(np.argmax(bands_f)) == t
