from .datasets import build_dataset, build_split_dataset  # noqa: F401
from .device_aug import build_device_augment, build_eval_normalize  # noqa: F401
from .loader import DataLoader  # noqa: F401
from .mixup import make_mixup_fn, mixup_active  # noqa: F401
from .samplers import DistributedSampler, RASampler, SequentialSampler  # noqa: F401
