"""RegNetY teacher model: config derivation, forward, torch import."""
import jax
import jax.numpy as jnp
import numpy as np

from slim_switch_moe_vit_tpu.models import create_model
from slim_switch_moe_vit_tpu.models.regnet import (
    adjust_widths_groups, generate_regnet_widths, import_torch_regnet,
)


def test_regnety160_config():
    widths, depths = generate_regnet_widths(106.23, 200, 2.48, 18)
    widths, groups = adjust_widths_groups(widths, [112] * len(widths))
    assert widths == [224, 448, 1232, 3024]
    assert depths == [2, 4, 11, 1]


def test_regnety_forward_shape():
    model = create_model("regnety_040", num_classes=7)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    assert "batch_stats" in variables
    out = model.apply(variables, x)
    assert out.shape == (1, 7)


def _synth_torch_sd(model, variables):
    """Build a torch-layout state dict from our own params (roundtrip test)."""
    sd = {}
    p = variables["params"]
    s = variables["batch_stats"]

    def conv_t(k):  # HWIO -> OIHW
        return np.asarray(k).transpose(3, 2, 0, 1)

    def put_cbn(src_p, src_s, prefix):
        sd[f"{prefix}.conv.weight"] = conv_t(src_p["conv"]["kernel"])
        sd[f"{prefix}.bn.weight"] = np.asarray(src_p["bn"]["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(src_p["bn"]["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(src_s["bn"]["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(src_s["bn"]["var"])

    put_cbn(p["stem"], s["stem"], "stem")
    for si, d in enumerate(model.stage_depths):
        for bi in range(d):
            name = f"s{si + 1}_b{bi + 1}"
            t = f"s{si + 1}.b{bi + 1}"
            for cn in ("conv1", "conv2", "conv3"):
                put_cbn(p[name][cn], s[name][cn], f"{t}.{cn}")
            if "se" in p[name]:
                sd[f"{t}.se.fc1.weight"] = conv_t(p[name]["se"]["fc1"]["kernel"])
                sd[f"{t}.se.fc1.bias"] = np.asarray(p[name]["se"]["fc1"]["bias"])
                sd[f"{t}.se.fc2.weight"] = conv_t(p[name]["se"]["fc2"]["kernel"])
                sd[f"{t}.se.fc2.bias"] = np.asarray(p[name]["se"]["fc2"]["bias"])
            if "downsample" in p[name]:
                put_cbn(p[name]["downsample"], s[name]["downsample"],
                        f"{t}.downsample")
    sd["head.fc.weight"] = np.asarray(p["head_fc"]["kernel"]).T
    sd["head.fc.bias"] = np.asarray(p["head_fc"]["bias"])
    return sd


def test_regnet_torch_import_roundtrip():
    model = create_model("regnety_040", num_classes=5)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x)
    sd = _synth_torch_sd(model, variables)
    imported = import_torch_regnet(sd, model, variables)
    out0 = model.apply(variables, x)
    out1 = model.apply(imported, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)
