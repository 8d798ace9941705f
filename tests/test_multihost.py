"""Multi-host (multi-process / DCN-analog) data parallelism — SURVEY §5.8's
second half, VERDICT r4 item 3.

A 2-process x 4-CPU-device jax.distributed cluster (tests/multihost_worker.py)
trains a mesh pretrain epoch pair and a mesh finetune-with-eval, and must:
- produce IDENTICAL losses/dice on both processes,
- match the single-process 8-device oracle run (same global mesh, same
  seed-deterministic global batches — parallel/mesh.py::put_tree only
  changes how shards are ingested; collective reduction order differs),
- write checkpoints / CSV / config.yaml from process 0 ONLY
  (on_master gating; reference analog: the vestigial _DDPMixin,
  contrastyou/trainer/base.py:23).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = Path(__file__).resolve().parents[1]
WORKER = ROOT / "tests" / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(local_devices=4):
    env = dict(os.environ)
    # the axon sitecustomize registers the TPU backend whenever this is set;
    # subprocesses must come up as plain CPU hosts
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    return env


def _run(args, timeout=900):
    p = subprocess.run([sys.executable, str(WORKER)] + args,
                       env=_env(local_devices=8),
                       cwd=str(ROOT), capture_output=True, text=True,
                       timeout=timeout)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    env = _env()
    logs = []
    procs = []
    for pid in range(2):
        log = open(tmp_path / f"w{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), "--port", str(port), "--pid",
             str(pid), "--nprocs", "2", "--outdir", str(tmp_path / "mh")],
            env=env, cwd=str(ROOT), stdout=log, stderr=subprocess.STDOUT))
    for p in procs:
        assert p.wait(timeout=900) == 0, \
            (tmp_path / "w0.log").read_text()[-3000:] + \
            (tmp_path / "w1.log").read_text()[-3000:]
    for log in logs:
        log.close()
    recs = {}
    for pid in range(2):
        lines = (tmp_path / f"w{pid}.log").read_text().strip().splitlines()
        recs[pid] = json.loads([l for l in lines if l.startswith("{")][-1])

    assert recs[0]["process_count"] == 2 and recs[1]["process_count"] == 2
    assert recs[0]["is_master"] and not recs[1]["is_master"]

    # both processes compute the same global training trajectory
    np.testing.assert_allclose(recs[0]["pre_loss"], recs[1]["pre_loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(recs[0]["best_dice"], recs[1]["best_dice"],
                               rtol=1e-6)
    # host-streaming ingestion (device_data=False): batches and eval `valid`
    # masks arrive as batch-sharded device arrays, so the eval fetch must
    # all_gather first (trainer.py::_fetch). Both processes must agree
    # bitwise; the trajectory itself differs from the device-data run (batch
    # assembly differs), so only sanity-bound the score.
    np.testing.assert_allclose(recs[0]["best_dice_stream"],
                               recs[1]["best_dice_stream"], rtol=1e-6)
    assert 0.0 <= recs[0]["best_dice_stream"] <= 1.0

    # IO gating: process 0 wrote everything, process 1 wrote nothing
    assert recs[0]["pre_ckpt"] and recs[0]["ft_best_ckpt"] and recs[0]["csv"]
    assert not (recs[1]["pre_ckpt"] or recs[1]["ft_best_ckpt"] or recs[1]["csv"])
    p1_dir = tmp_path / "mh" / "p1"
    leftovers = [str(f) for f in p1_dir.rglob("*") if f.is_file()]
    assert not leftovers, leftovers

    # the 2-process run matches the single-process 8-device oracle. Not
    # bit-exact: the same global math compiles to cross-host gloo
    # collectives vs in-process ones, whose f32 reduction orders differ
    # (measured ~1e-5 rel after two epochs of training); the tolerance
    # covers reduction-order drift while still pinning the trajectory.
    oracle = _run(["--port", str(_free_port()), "--nprocs", "1",
                   "--outdir", str(tmp_path / "solo")])
    np.testing.assert_allclose(recs[0]["pre_loss"], oracle["pre_loss"],
                               rtol=5e-4)
    np.testing.assert_allclose(recs[0]["best_dice"], oracle["best_dice"],
                               atol=5e-3)
