"""Multi-host seams under mocks (reference utils.py:55-115, 269-296).

The environment has one host, so ``process_count > 1`` never occurs for real;
these tests mock the process topology to verify the cross-process metric-sync
math and the env-var parsing of ``init_distributed_mode`` (torchrun / SLURM /
JAX-native variants) without a cluster.
"""
import builtins
import os
from unittest import mock

import numpy as np

from slim_switch_moe_vit_tpu.parallel import distributed as dist
from slim_switch_moe_vit_tpu.utils.metrics import MetricLogger, SmoothedValue


# ---------------------------------------------------------------------------
# SmoothedValue.synchronize_between_processes (reference utils.py:73-84)
# ---------------------------------------------------------------------------

def _mock_allgather(per_rank_arrays):
    """process_allgather returns the (n_ranks, ...) stack of every rank's
    array; simulate 'this rank contributed arr, the others contributed the
    recorded values'."""
    def gather(arr):
        rows = list(per_rank_arrays) + [np.asarray(arr)]
        return np.stack(rows, axis=0)
    return gather


def test_smoothed_value_sync_totals():
    sv = SmoothedValue(window_size=4)
    for v in (1.0, 2.0, 3.0):
        sv.update(v)
    assert sv.count == 3 and sv.total == 6.0

    others = [np.asarray([5.0, 50.0]), np.asarray([2.0, 14.0])]  # 2 peers
    with mock.patch("jax.process_count", return_value=3), \
            mock.patch("jax.experimental.multihost_utils.process_allgather",
                       _mock_allgather(others)):
        sv.synchronize_between_processes()

    # totals are summed across ranks; the local window deque is untouched
    assert sv.count == 3 + 5 + 2
    assert sv.total == 6.0 + 50.0 + 14.0
    assert sv.global_avg == 70.0 / 10.0
    assert list(sv.deque) == [1.0, 2.0, 3.0]


def test_smoothed_value_sync_noop_single_process():
    sv = SmoothedValue()
    sv.update(4.0)
    with mock.patch("jax.process_count", return_value=1):
        sv.synchronize_between_processes()  # must not call any collective
    assert sv.count == 1 and sv.total == 4.0


def test_metric_logger_syncs_every_meter():
    ml = MetricLogger()
    ml.update(loss=2.0, acc=1.0)
    others = [np.asarray([1.0, 10.0])]
    with mock.patch("jax.process_count", return_value=2), \
            mock.patch("jax.experimental.multihost_utils.process_allgather",
                       _mock_allgather(others)):
        ml.synchronize_between_processes()
    assert ml.meters["loss"].count == 2 and ml.meters["loss"].total == 12.0
    assert ml.meters["acc"].count == 2 and ml.meters["acc"].total == 11.0


# ---------------------------------------------------------------------------
# init_distributed_mode env parsing (reference utils.py:269-296)
# ---------------------------------------------------------------------------

class _Args:
    dist_url = "env://"


def _run_init(env, args=None):
    """Run init_distributed_mode under a controlled env with the actual
    cluster join mocked out; restore the print builtin it may patch."""
    calls = []

    def fake_init(**kwargs):
        calls.append(kwargs)

    orig_print = builtins.print
    try:
        with mock.patch.dict(os.environ, env, clear=False), \
                mock.patch("jax.distributed.initialize", fake_init), \
                mock.patch("jax.process_index", return_value=0), \
                mock.patch("jax.process_count", return_value=2):
            ok = dist.init_distributed_mode(args)
    finally:
        builtins.print = orig_print
    return ok, calls


_DIST_VARS = ("COORDINATOR_ADDRESS", "RANK", "WORLD_SIZE", "MASTER_ADDR",
              "MASTER_PORT", "SLURM_PROCID", "SLURM_NTASKS",
              "JAX_AUTO_DISTRIBUTED")


def _clean_env(extra):
    env = {k: "" for k in _DIST_VARS}
    for k in _DIST_VARS:
        os.environ.pop(k, None)
    env.update(extra)
    return {k: v for k, v in env.items() if v}


def test_init_torchrun_env():
    args = _Args()
    ok, calls = _run_init(_clean_env({
        "RANK": "1", "WORLD_SIZE": "4",
        "MASTER_ADDR": "10.0.0.1", "MASTER_PORT": "29500",
    }), args)
    assert ok and len(calls) == 1
    assert calls[0] == {"coordinator_address": "10.0.0.1:29500",
                        "num_processes": 4, "process_id": 1}
    assert args.distributed and args.rank == 0 and args.world_size == 2


def test_init_torchrun_default_port():
    ok, calls = _run_init(_clean_env({
        "RANK": "0", "WORLD_SIZE": "2", "MASTER_ADDR": "h1",
    }))
    assert ok and calls[0]["coordinator_address"] == "h1:12355"


def test_init_slurm_env_with_dist_url():
    args = _Args()
    args.dist_url = "tcp://c42:6000"
    ok, calls = _run_init(_clean_env({
        "SLURM_PROCID": "3", "SLURM_NTASKS": "8",
    }), args)
    assert ok and calls[0] == {"coordinator_address": "c42:6000",
                               "num_processes": 8, "process_id": 3}


def test_init_jax_native_autodetect():
    ok, calls = _run_init(_clean_env({"COORDINATOR_ADDRESS": "coord:1234"}))
    assert ok and calls == [{}]  # jax-native path autodetects from env


def test_init_no_env_is_single_host():
    args = _Args()
    ok, calls = _run_init(_clean_env({}), args)
    assert not ok and calls == []
    assert args.distributed is False


def test_log_every_prints_max_mem_when_backend_reports(capsys):
    """reference utils.py:186-203 prints CUDA max mem per log line; our
    MetricLogger appends 'max mem' when the device reports memory_stats
    (the axon tunnel returns None, so this is mocked)."""
    import slim_switch_moe_vit_tpu.utils.metrics as metrics_mod

    ml = MetricLogger()
    with mock.patch.object(metrics_mod, "_device_max_mem_mb",
                           return_value=123.4):
        for _ in ml.log_every(range(3), print_freq=1, header="T:"):
            pass
    out = capsys.readouterr().out
    assert "max mem: 123MB" in out


def test_init_failure_falls_back_single_host():
    args = _Args()
    orig_print = builtins.print
    try:
        with mock.patch.dict(os.environ, _clean_env({
                "RANK": "0", "WORLD_SIZE": "2", "MASTER_ADDR": "h"}),
                clear=False), \
                mock.patch("jax.distributed.initialize",
                           side_effect=RuntimeError("no cluster")):
            ok = dist.init_distributed_mode(args)
    finally:
        builtins.print = orig_print
    assert not ok and args.distributed is False
