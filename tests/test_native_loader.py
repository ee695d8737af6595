"""Native C++ image pipeline vs PIL oracle (skipped when the lib isn't built:
``make -C native``)."""
import numpy as np
import pytest

from slim_switch_moe_vit_tpu.data.native_loader import (
    batch_crop_resize, crop_resize, native_available, pad_reflect_crop,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib not built")


def test_crop_resize_matches_pil():
    from PIL import Image

    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (300, 400, 3), np.uint8)
    got = crop_resize(img, 20, 30, 250, 350, 224)
    want = np.asarray(Image.fromarray(img).crop((30, 20, 380, 270))
                      .resize((224, 224), Image.BICUBIC))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.mean() < 0.5
    assert (diff > 2).mean() < 0.02


def test_batch_crop_resize_matches_single():
    rs = np.random.RandomState(1)
    imgs = [rs.randint(0, 256, (100 + 7 * i, 120, 3), np.uint8)
            for i in range(5)]
    crops = np.asarray([[0, 0, 90, 100]] * 5, np.int32)
    out = batch_crop_resize(imgs, crops, 64, num_threads=2)
    for i in range(5):
        single = crop_resize(imgs[i], 0, 0, 90, 100, 64)
        np.testing.assert_array_equal(out[i], single)


def test_pad_reflect_crop_matches_numpy():
    rs = np.random.RandomState(2)
    img = rs.randint(0, 256, (32, 32, 3), np.uint8)
    padded = np.pad(img, ((4, 4), (4, 4), (0, 0)), mode="reflect")
    got = pad_reflect_crop(img, 4, 3, 5, 32)
    want = padded[3:35, 5:37]
    np.testing.assert_array_equal(got, want)


def test_transforms_use_native_path():
    from slim_switch_moe_vit_tpu.data.transforms import resize_center_crop

    rs = np.random.RandomState(3)
    img = rs.randint(0, 256, (300, 400, 3), np.uint8)
    out = resize_center_crop(img, 224)
    assert out.shape == (224, 224, 3)
