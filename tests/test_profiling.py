"""Trace-parsing tests for utils/profiling.py.

The device plane is the ONLY trustworthy timing source on this relay
(RESULTS.md round-2 correction), so the parser itself deserves tests: a
"Steps" line when the program carries step markers, and the "XLA Modules"
fallback for programs that never get them (forward-only eval programs —
the round-4 gap that left bench's eval flavor unmeasured).

Protos are synthesized, so this runs on CPU without a TPU trace.
"""
import pytest

xplane_pb2 = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2")

from spcl_tpu.utils.profiling import device_ms_per_step  # noqa: E402


def _write_space(tmp_path, planes):
    xs = xplane_pb2.XSpace()
    for plane_name, lines in planes:
        plane = xs.planes.add()
        plane.name = plane_name
        for line_name, durations_ps in lines:
            line = plane.lines.add()
            line.name = line_name
            for d in durations_ps:
                ev = line.events.add()
                ev.duration_ps = int(d)
    p = tmp_path / "trace" / "host.xplane.pb"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(xs.SerializeToString())
    return str(tmp_path / "trace")


def test_steps_line_mean(tmp_path):
    # two steps of 2ms and 4ms -> 3 ms/step
    d = _write_space(tmp_path, [
        ("/device:TPU:0", [("Steps", [2e9, 4e9]), ("XLA Modules", [9e9])]),
    ])
    assert device_ms_per_step(d) == pytest.approx(3.0)
    # Steps line wins even when `calls` is passed
    assert device_ms_per_step(d, calls=5) == pytest.approx(3.0)


def test_module_fallback_needs_calls(tmp_path):
    # no Steps line (eval-style program): 20 module executions, 1ms each
    d = _write_space(tmp_path, [
        ("/device:TPU:0", [("XLA Modules", [1e9] * 20), ("XLA Ops", [5e8])]),
    ])
    assert device_ms_per_step(d) is None  # unknown call count: no guess
    assert device_ms_per_step(d, calls=20) == pytest.approx(1.0)


def test_module_fallback_normalizes_per_plane(tmp_path):
    """On a multi-chip trace every chip's plane carries module events for the
    SAME step — the fallback must not over-report by n_chips (ADVICE r4)."""
    d = _write_space(tmp_path, [
        ("/device:TPU:0", [("XLA Modules", [1e9] * 10)]),
        ("/device:TPU:1", [("XLA Modules", [1e9] * 10)]),
        ("/device:TPU:2", [("XLA Modules", [1e9] * 10)]),
        ("/device:TPU:3", [("XLA Modules", [1e9] * 10)]),
    ])
    assert device_ms_per_step(d, calls=10) == pytest.approx(1.0)


def test_non_tpu_planes_ignored(tmp_path):
    d = _write_space(tmp_path, [
        ("/host:CPU", [("Steps", [7e9]), ("XLA Modules", [7e9])]),
    ])
    assert device_ms_per_step(d, calls=1) is None
