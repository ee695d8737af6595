"""Profiling helpers (reference: iteration timing in ``utils.py:152-211`` and
the analytic FLOP hook; TPU-native equivalent = XLA traces + cost analysis).

``trace`` wraps ``jax.profiler`` around a region; ``summarize_trace`` parses
the perfetto trace into per-op device-time totals — the table this project
used to find the MoE dispatch bottlenecks.
"""
from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import re
import typing as typ


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 20,
                    steps: int = 1) -> typ.List[typ.Tuple[float, int, str]]:
    """Aggregate device-op durations from the newest trace under ``log_dir``.
    Returns [(ms_per_step, count, shape/op label)], largest first."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    tot: typ.Dict[str, float] = collections.defaultdict(float)
    cnt: typ.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        name = e["name"]
        if name.startswith("jit_") or name.isdigit():
            continue
        ln = e.get("args", {}).get("long_name", "")
        m = re.match(r"%\S+ = \(?([a-z0-9]+\[[^\]]*\])", ln)
        shape = m.group(1) if m else ""
        # strip the uniquifying suffix digits so fusions group by kind+shape
        kind = re.sub(r"[.\d]+$", "", name)
        label = f"{kind:24s} {shape}" if shape else kind
        tot[label] += e.get("dur", 0)
        cnt[label] += 1
    rows = sorted(((d / steps / 1e3, cnt[k], k) for k, d in tot.items()),
                  reverse=True)
    return rows[:top]
