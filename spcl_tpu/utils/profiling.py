"""Device-time extraction from jax.profiler traces.

On this machine's relay the dispatch ack outruns device execution, so
wall-clock timing of jitted steps is an upper bound, not a measurement
(RESULTS.md). The profiler's device plane is ground truth: these helpers
parse the .xplane.pb the trace writes and report per-step device time.
Used by bench.py and by Trainer when `Trainer.profile_dir` is set.

(The reference has no systematic profiling at all — SURVEY §5.1: an unused
EpocherTimer and tqdm rates.)
"""
from __future__ import annotations

import glob
from typing import Optional


def device_ms_per_step(trace_dir: str, calls: Optional[int] = None) -> Optional[float]:
    """Mean device time per step from a jax.profiler trace directory.

    Reads the TPU device plane's "Steps" line (one event per executed
    program). Some programs (e.g. the eval step: forward-only, no optimizer
    update) never get step markers — their traces carry only an
    "XLA Modules" line; when `calls` (the known number of traced calls) is
    given, falls back to total module device time / calls. Returns None when
    no device plane / parser is available (e.g. CPU traces, or tensorflow's
    xplane protos not installed)."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        return None
    total, count = 0.0, 0
    module_total, module_planes = 0.0, 0
    for p in glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        try:
            xs.ParseFromString(open(p, "rb").read())
        except Exception:
            continue
        for plane in xs.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            plane_modules = 0.0
            for line in plane.lines:
                if line.name == "Steps" and line.events:
                    total += sum(e.duration_ps for e in line.events) / 1e12
                    count += len(line.events)
                elif line.name == "XLA Modules" and line.events:
                    plane_modules += sum(e.duration_ps for e in line.events) / 1e12
            if plane_modules:
                module_total += plane_modules
                module_planes += 1
    if count:
        return total / count * 1e3
    if calls and module_total:
        # Each chip's plane carries its own module events for the SAME step —
        # normalize by contributing planes so multi-chip traces don't
        # over-report by n_chips (ADVICE r4), mirroring the Steps path.
        return module_total / module_planes / calls * 1e3
    return None


def device_op_breakdown(trace_dir: str, top: int = 0) -> Optional[dict]:
    """Aggregate device time by XLA op from a trace directory.

    Parses the TPU device plane's per-core op lines ("XLA Ops") and returns
    {op_display_name: total_ms} sorted descending (all ops, or `top` first).
    The op names are fusion names — coarse but enough to attribute step time
    to conv stages / warp shears / loss matmuls."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        return None
    totals: dict = {}
    for p in glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        try:
            xs.ParseFromString(open(p, "rb").read())
        except Exception:
            continue
        for plane in xs.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            names = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for e in line.events:
                    n = names.get(e.metadata_id, str(e.metadata_id))
                    totals[n] = totals.get(n, 0.0) + e.duration_ps / 1e9
    if not totals:
        return None
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    if top:
        items = items[:top]
    return dict(items)


def profile_device_time(run_one, reps: int = 20) -> Optional[float]:
    """Trace `reps` calls of run_one() and return device ms per call."""
    import shutil
    import tempfile
    import jax
    d = tempfile.mkdtemp(prefix="spcl_trace_")
    try:
        with jax.profiler.trace(d):
            out = None
            for _ in range(reps):
                out = run_one()
            jax.block_until_ready(out)
        return device_ms_per_step(d, calls=reps)
    except Exception:
        return None
    finally:
        shutil.rmtree(d, ignore_errors=True)
