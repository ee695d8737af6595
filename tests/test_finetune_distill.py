"""Finetune + distillation in one run (reference main.py:532-573 + 666-694 —
the two paths are independent and compose; round-1 guard removed)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from slim_switch_moe_vit_tpu.config import get_args_parser
from slim_switch_moe_vit_tpu.main import main


def _deit_tiny_state_dict(rs, distilled: bool, nb_classes: int = 1000,
                          embed_dim: int = 192, depth: int = 12):
    """Synthesize a DeiT-tiny torch state_dict (224px grid) for import tests."""
    def t(*shape):
        return torch.tensor(rs.randn(*shape).astype(np.float32) * 0.02)

    n_extra = 2 if distilled else 1
    sd = {
        "patch_embed.proj.weight": t(embed_dim, 3, 16, 16),
        "patch_embed.proj.bias": t(embed_dim),
        "cls_token": t(1, 1, embed_dim),
        "pos_embed": t(1, 196 + n_extra, embed_dim),
        "norm.weight": t(embed_dim), "norm.bias": t(embed_dim),
        "head.weight": t(nb_classes, embed_dim), "head.bias": t(nb_classes),
    }
    if distilled:
        sd["dist_token"] = t(1, 1, embed_dim)
        sd["head_dist.weight"] = t(nb_classes, embed_dim)
        sd["head_dist.bias"] = t(nb_classes)
    for i in range(depth):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": t(embed_dim), f"{b}.norm1.bias": t(embed_dim),
            f"{b}.attn.qkv.weight": t(3 * embed_dim, embed_dim),
            f"{b}.attn.qkv.bias": t(3 * embed_dim),
            f"{b}.attn.proj.weight": t(embed_dim, embed_dim),
            f"{b}.attn.proj.bias": t(embed_dim),
            f"{b}.norm2.weight": t(embed_dim), f"{b}.norm2.bias": t(embed_dim),
            f"{b}.mlp.fc1.weight": t(4 * embed_dim, embed_dim),
            f"{b}.mlp.fc1.bias": t(4 * embed_dim),
            f"{b}.mlp.fc2.weight": t(embed_dim, 4 * embed_dim),
            f"{b}.mlp.fc2.bias": t(embed_dim),
        })
    return sd


def test_finetune_plus_distillation_one_run(tmp_path):
    rs = np.random.RandomState(0)
    student_ckpt = tmp_path / "student.pth"
    teacher_ckpt = tmp_path / "teacher.pth"
    torch.save({"model": _deit_tiny_state_dict(rs, distilled=True)},
               student_ckpt)
    torch.save({"model": _deit_tiny_state_dict(rs, distilled=False)},
               teacher_ckpt)

    args = get_args_parser().parse_args([
        "--model", "deit_tiny_distilled_patch16_224",
        "--data-set", "SYNTH", "--input-size", "32",
        "--batch-size", "8", "--epochs", "1", "--warmup-epochs", "0",
        "--max-steps-per-epoch", "1", "--num_workers", "1",
        "--finetune", str(student_ckpt),
        "--distillation-type", "hard",
        "--teacher-model", "deit_tiny_patch16_224",
        "--teacher-path", str(teacher_ckpt),
        "--output_dir", "",
    ])
    args.synth_size = 32
    main(args)  # must run one train step + eval without error
