"""utils/profiling.summarize_trace on a synthetic perfetto trace (the
parser this project's per-op floor tables are built from — PARITY.md
"Measured performance"). Checks: TPU-pid filtering, jit_/digit-row
exclusion, shape-label extraction, suffix grouping, per-step division."""
import gzip
import json
import os

from slim_switch_moe_vit_tpu.utils.profiling import summarize_trace


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(str(d))
    payload = {"traceEvents": events}
    with gzip.open(str(d / "t.trace.json.gz"), "wt") as f:
        json.dump(payload, f)
    return str(tmp_path)


def test_summarize_trace_groups_and_filters(tmp_path):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "Host threads"}},
        # two fusions differing only by the uniquifying suffix -> grouped
        {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 1000,
         "args": {"long_name": "%fusion.1 = (bf16[128,197,384]{2,1,0}"}},
        {"ph": "X", "pid": 1, "name": "fusion.2", "dur": 3000,
         "args": {"long_name": "%fusion.2 = (bf16[128,197,384]{2,1,0}"}},
        # different shape -> separate row
        {"ph": "X", "pid": 1, "name": "mlp.3", "dur": 8000,
         "args": {"long_name": "%mlp.3 = (bf16[54784,384]{1,0}"}},
        # host event: must be excluded
        {"ph": "X", "pid": 2, "name": "fusion.9", "dur": 99999,
         "args": {"long_name": "%fusion.9 = (bf16[128,197,384]{2,1,0}"}},
        # jit_ wrapper and bare-digit rows: excluded
        {"ph": "X", "pid": 1, "name": "jit_train_step", "dur": 77777},
        {"ph": "X", "pid": 1, "name": "1234", "dur": 55555},
    ]
    log_dir = _write_trace(tmp_path, events)
    rows = summarize_trace(log_dir, top=10, steps=2)

    labels = {label: (ms, cnt) for ms, cnt, label in rows}
    assert len(rows) == 2
    mlp_key = [k for k in labels if k.startswith("mlp")][0]
    fusion_key = [k for k in labels if k.startswith("fusion")][0]
    # per-step ms: dur is us, steps=2
    assert abs(labels[mlp_key][0] - 8000 / 2 / 1e3) < 1e-9
    assert labels[mlp_key][1] == 1
    assert abs(labels[fusion_key][0] - (1000 + 3000) / 2 / 1e3) < 1e-9
    assert labels[fusion_key][1] == 2  # suffixes grouped
    assert "bf16[128,197,384]" in fusion_key
    # sorted largest first
    assert rows[0][2] == mlp_key


def test_summarize_trace_missing_dir_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        summarize_trace(str(tmp_path / "nope"))
