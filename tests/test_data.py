"""Data pipeline tests: samplers, mixup, device augmentation, loaders, memory."""
import types

import jax
import jax.numpy as jnp
import numpy as np

from slim_switch_moe_vit_tpu.data import (
    DataLoader, RASampler, SequentialSampler, build_dataset,
    build_split_dataset, build_device_augment, build_eval_normalize,
    make_mixup_fn,
)
from slim_switch_moe_vit_tpu.utils.memory import RehearsalMemory


def _args(**over):
    base = dict(data_set="SYNTH", data_path="", input_size=32, seed=0,
                synth_size=64, synth_classes=10, eval_crop_ratio=0.875,
                train_interpolation="bicubic", src=False,
                inat_category="name")
    base.update(over)
    return types.SimpleNamespace(**base)


def test_synth_dataset_and_loader():
    ds, nb = build_dataset(True, _args())
    assert nb == 10 and len(ds) == 64
    loader = DataLoader(ds, SequentialSampler(len(ds)), batch_size=16,
                        drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    x, y = batches[0]
    assert x.shape == (16, 32, 32, 3) and x.dtype == np.uint8
    assert y.shape == (16,)


def test_split_dataset_class_range():
    ds, nb, idx = build_split_dataset(True, _args(), start_class=2, class_size=3)
    assert nb == 10
    assert set(np.unique(ds.targets)) <= {2, 3, 4}
    assert len(idx) == len(ds)


def test_rasampler_repeats_and_sharding():
    n = 512
    samplers = [RASampler(n, num_replicas=2, rank=r, shuffle=True,
                          num_repeats=3) for r in range(2)]
    for s in samplers:
        s.set_epoch(3)
    i0, i1 = (list(iter(s)) for s in samplers)
    assert len(i0) == len(i1) == (n // 256 * 256) // 2
    # repeated-aug: same sample appears on different ranks at matching slots
    assert i0 != i1
    # deterministic per epoch
    samplers[0].set_epoch(3)
    assert list(iter(samplers[0])) == i0


def test_mixup_shapes_and_lambda():
    fn = make_mixup_fn(mixup_alpha=0.8, cutmix_alpha=1.0, num_classes=10,
                       label_smoothing=0.1)
    x = jnp.ones((8, 16, 16, 3))
    y = jnp.arange(8) % 10
    xm, ym = jax.jit(fn)(jax.random.PRNGKey(0), x, y)
    assert xm.shape == x.shape and ym.shape == (8, 10)
    np.testing.assert_allclose(np.asarray(jnp.sum(ym, -1)), 1.0, rtol=1e-5)


def test_mixup_prob_zero_is_identity_images():
    fn = make_mixup_fn(mixup_alpha=0.8, cutmix_alpha=1.0, prob=0.0,
                       num_classes=10, label_smoothing=0.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3))
    y = jnp.array([0, 1, 2, 3])
    xm, ym = fn(jax.random.PRNGKey(0), x, y)
    np.testing.assert_allclose(np.asarray(xm), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ym),
                               np.asarray(jax.nn.one_hot(y, 10)), atol=1e-6)


def test_device_augment_runs_and_normalizes():
    aug = build_device_augment(input_size=16, aa="rand-m9-mstd0.5-inc1",
                               reprob=0.25)
    x = np.random.RandomState(0).randint(0, 256, (4, 16, 16, 3), np.uint8)
    out = jax.jit(aug)(jax.random.PRNGKey(0), jnp.asarray(x))
    assert out.shape == (4, 16, 16, 3) and out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # normalized: values roughly centered
    assert abs(float(jnp.mean(out))) < 3.0


def test_device_augment_three_augment_mode():
    aug = build_device_augment(input_size=16, aa=None, three_augment=True,
                               reprob=0.0)
    x = np.random.RandomState(0).randint(0, 256, (4, 16, 16, 3), np.uint8)
    out = jax.jit(aug)(jax.random.PRNGKey(0), jnp.asarray(x))
    assert np.isfinite(np.asarray(out)).all()


def test_eval_normalize_matches_formula():
    norm = build_eval_normalize()
    x = np.full((1, 2, 2, 3), 255, np.uint8)
    out = np.asarray(norm(jnp.asarray(x)))
    want = (255 - np.array([0.485, 0.456, 0.406]) * 255) / (
        np.array([0.229, 0.224, 0.225]) * 255)
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_rehearsal_memory_semantics():
    mem = RehearsalMemory(10, (), (), use_indices=True)
    mem.add(np.arange(8), np.arange(8), 8)
    assert len(mem) == 8
    mem.add(np.arange(100, 108), np.arange(100, 108), 8)
    assert len(mem) == 10  # capped
    assert mem.batch.shape == (10,)
    # contents are a mix of old and new
    vals = set(mem.batch.tolist())
    assert any(v >= 100 for v in vals)


def test_cutmix_minmax_box_ratio():
    fn = make_mixup_fn(mixup_alpha=0.0, cutmix_alpha=0.0,
                       cutmix_minmax=[0.3, 0.6], num_classes=10,
                       label_smoothing=0.0)
    x = jnp.ones((4, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3])
    for seed in range(5):
        xm, ym = fn(jax.random.PRNGKey(seed), x, y)
        # lam = max target weight; box area ratio in [0.09, 0.36]
        lam = float(jnp.max(ym[0]))
        area = 1.0 - lam
        assert 0.3 * 0.3 - 1e-6 <= area <= 0.6 * 0.6 + 1e-6, (seed, area)


def test_loader_deterministic_with_workers():
    """Per-sample RNG (seed, epoch, index) makes 8-worker runs reproducible
    (torch worker-seeding parity, reference main.py:757-786)."""
    def run(epoch):
        ds, _ = build_dataset(True, _args(input_size=16, synth_size=48))
        ds.transform.set_epoch(epoch)
        loader = DataLoader(ds, SequentialSampler(len(ds)), batch_size=16,
                            num_workers=8)
        return [x.copy() for x, _ in loader]

    a, b = run(0), run(0)
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    # different epoch -> different augmentation stream
    c = run(1)
    assert any(not np.array_equal(xa, xc) for xa, xc in zip(a, c))


def test_imagenet100_class_selection(tmp_path, monkeypatch):
    """First-100-in-scandir-order then sorted; pickled map wins if present
    (reference datasets.py:210-236)."""
    import pickle as pkl

    from PIL import Image

    from slim_switch_moe_vit_tpu.data.datasets import _imagenet100_index

    root = tmp_path / "val"
    for name in ["n03", "n01", "n02"]:
        (root / name).mkdir(parents=True)
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(root / name / "x.jpg")
    monkeypatch.chdir(tmp_path)

    idx = _imagenet100_index(str(root))
    assert sorted(idx) == ["n01", "n02", "n03"]
    assert [idx[c] for c in sorted(idx)] == [0, 1, 2]

    # a pickled class_to_idx (the reference's imnet100/ cache) takes precedence
    (tmp_path / "imnet100").mkdir()
    override = {"n02": 0, "n03": 1}
    with open(tmp_path / "imnet100" / "train_class_to_idx.pkl", "wb") as f:
        pkl.dump(override, f)
    assert _imagenet100_index(str(root)) == override

    ds, nb = build_dataset(False, _args(data_set="IMNET100",
                                        data_path=str(tmp_path),
                                        input_size=4))
    assert nb == 100 and len(ds) == 2  # only the 2 pickled classes load
