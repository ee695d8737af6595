"""Coverage for smaller subsystems: iNat JSON parsing, logging writers,
EMA-eval, sampler edge cases."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from slim_switch_moe_vit_tpu.data.datasets import INatDataset
from slim_switch_moe_vit_tpu.data.samplers import DistributedSampler, RASampler
from slim_switch_moe_vit_tpu.engine import make_eval_step
from slim_switch_moe_vit_tpu.models import create_model
from slim_switch_moe_vit_tpu.train_state import create_train_state
from slim_switch_moe_vit_tpu.utils.logging import (
    TensorboardTracker, append_log_stats,
)
from slim_switch_moe_vit_tpu.utils.metrics import MetricLogger, SmoothedValue


def test_inat_json_parsing(tmp_path):
    from PIL import Image

    # layout: root/train_val2018/<cat_id>/<file>
    (tmp_path / "train_val2018" / "7").mkdir(parents=True)
    img_path = tmp_path / "train_val2018" / "7" / "a.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_path)
    ann = {"images": [{"file_name": "train_val2018/x/7/a.jpg"}],
           "annotations": [{"category_id": 7}]}
    cats = {str(i): {"name": f"sp{i}", "genus": f"g{i % 3}"}
            for i in range(10)}
    # categories.json is a list indexed by category id in the reference
    cats_list = [{"name": f"sp{i}", "genus": f"g{i % 3}"} for i in range(10)]
    for fn, payload in (("train2018.json", ann), ("val2018.json", ann),
                        ("categories.json", cats_list)):
        with open(tmp_path / fn, "w") as f:
            json.dump(payload, f)
    ds = INatDataset(str(tmp_path), train=True, year=2018, category="name")
    assert ds.nb_classes == 1
    assert len(ds.samples) == 1
    img, t = ds[0]
    assert img.shape == (8, 8, 3) and t == 0


def test_logging_writers(tmp_path):
    tr = TensorboardTracker(str(tmp_path / "tb"))
    tr.log_loss(1.0, 0)
    tr.log_test_acc(50.0, 0)
    tr.log_task_test_acc(40.0, 0)
    tr.close()
    append_log_stats(str(tmp_path), {"epoch": 0, "test_acc1": 50.0})
    append_log_stats(str(tmp_path), {"epoch": 1, "test_acc1": 60.0})
    lines = open(tmp_path / "log.txt").read().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["epoch"] == 1
    # rank-gated no-op
    append_log_stats(str(tmp_path), {"epoch": 2}, is_main=False)
    assert len(open(tmp_path / "log.txt").read().strip().splitlines()) == 2


def test_metric_logger_weighted_average():
    ml = MetricLogger()
    ml.meters["acc1"] = SmoothedValue()
    ml.meters["acc1"].update(100.0, n=1)
    ml.meters["acc1"].update(0.0, n=3)
    assert ml.acc1.global_avg == 25.0
    assert ml.acc1.max == 100.0


def test_eval_with_ema_params():
    model = create_model("deit_tiny_patch16_224", num_classes=5, img_size=32)
    state = create_train_state(model, (1, 32, 32, 3), use_ema=True)
    # perturb live params; EMA still the originals
    state = state.replace(params=jax.tree.map(lambda p: p + 1.0, state.params))
    ev_raw = make_eval_step(model, use_ema=False)
    ev_ema = make_eval_step(model, use_ema=True)
    x = jnp.ones((2, 32, 32, 3))
    y = jnp.zeros(2, jnp.int32)
    out_raw = ev_raw(state, x, y)
    out_ema = ev_ema(state, x, y)
    assert float(out_raw[0]) != float(out_ema[0])


def test_distributed_sampler_no_shuffle_and_padding():
    s = DistributedSampler(10, num_replicas=4, rank=3, shuffle=False)
    idx = list(iter(s))
    assert len(idx) == 3  # ceil(10/4)
    assert all(0 <= i < 10 for i in idx)


def test_rasampler_no_shuffle_deterministic():
    s = RASampler(512, num_replicas=1, rank=0, shuffle=False)
    idx = list(iter(s))
    assert idx[:6] == [0, 0, 0, 1, 1, 1]  # 3x repeats in order
    assert len(idx) == 512
