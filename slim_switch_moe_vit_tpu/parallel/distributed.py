"""Multi-host runtime init (reference: ``utils.py:269-296``).

The reference discovers rank/world from torchrun or SLURM env vars and calls
``torch.distributed.init_process_group(backend='nccl')``. The TPU-native
equivalent is ``jax.distributed.initialize``: each host joins the cluster,
XLA owns the collectives over ICI/DCN. Rank helpers mirror the reference's
(``get_rank``/``get_world_size``/``is_main_process``/``save_on_master``).
"""
from __future__ import annotations

import os


def init_distributed_mode(args=None) -> bool:
    """Initialize multi-host JAX if the environment asks for it. Returns True
    when running distributed. Env support, mirroring utils.py:270-276:

    - JAX-native: COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    - torchrun-style: RANK / WORLD_SIZE / MASTER_ADDR / MASTER_PORT
    - SLURM: SLURM_PROCID / SLURM_NTASKS + --dist_url for the coordinator
    - TPU pods: jax.distributed.initialize() autodetects with no args
    """
    import jax

    env = os.environ
    try:
        if "COORDINATOR_ADDRESS" in env:
            jax.distributed.initialize()
        elif "RANK" in env and "WORLD_SIZE" in env and "MASTER_ADDR" in env:
            jax.distributed.initialize(
                coordinator_address=(
                    f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '12355')}"),
                num_processes=int(env["WORLD_SIZE"]),
                process_id=int(env["RANK"]),
            )
        elif "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
            url = getattr(args, "dist_url", "env://") if args else "env://"
            coord = url.replace("tcp://", "") if url.startswith("tcp://") \
                else None
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(env["SLURM_NTASKS"]),
                process_id=int(env["SLURM_PROCID"]),
            )
        elif env.get("JAX_AUTO_DISTRIBUTED", "") == "1":
            jax.distributed.initialize()
        else:
            if args is not None:
                args.distributed = False
            print("Not using distributed mode")
            return False
    except Exception as e:  # single-host fallback, mirror crash-fast intent
        print(f"distributed init failed ({e}); continuing single-host")
        if args is not None:
            args.distributed = False
        return False

    if args is not None:
        args.distributed = True
        args.rank = jax.process_index()
        args.world_size = jax.process_count()
    setup_for_distributed(jax.process_index() == 0)
    return True


def get_world_size() -> int:
    import jax

    return jax.process_count()


def get_rank() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def save_on_master(save_fn, *args, **kwargs):
    """Gate a save callable on rank 0 (reference utils.py:264-266)."""
    if is_main_process():
        return save_fn(*args, **kwargs)


def setup_for_distributed(is_master: bool):
    """Master-only print (reference utils.py:224-237)."""
    import builtins

    builtin_print = builtins.print

    def print_(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_
