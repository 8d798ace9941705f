#!/usr/bin/env python
"""Measure the fused-Pallas vs naive-XLA SupCon crossover on the DEVICE PLANE
(VERDICT r2 item 5: the _FUSED_MIN_ROWS=1024 constant was a guess — relay
wall-clock under ~2ms is dispatch-bound noise; only profiler device time
counts on this machine, CLAUDE.md).

Per 2N in the sweep: jit value_and_grad of the self-paced criterion (the
training configuration: loss + backward) for both implementations and report
profiler device ms per call. Writes tmp/crossover_r3.json.

Run SOLO on the real TPU: python scripts/measure_crossover.py
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from spcl_tpu.losses import self_paced_supcon_loss
    from spcl_tpu.ops import fused_self_paced_supcon
    from spcl_tpu.utils.profiling import profile_device_time

    assert jax.default_backend() == "tpu", jax.default_backend()
    d = 256
    results = []
    for two_n in (128, 256, 512, 1024, 2048, 4096):
        n = two_n // 2
        rng = np.random.RandomState(two_n)
        z1 = rng.randn(n, d).astype(np.float32)
        z1 /= np.linalg.norm(z1, axis=1, keepdims=True)
        z2 = rng.randn(n, d).astype(np.float32)
        z2 /= np.linalg.norm(z2, axis=1, keepdims=True)
        labels = jnp.asarray(rng.randint(0, 3, n).astype(np.int32))
        valid = jnp.ones((n,), jnp.float32)
        z1, z2 = jax.device_put((jnp.asarray(z1), jnp.asarray(z2)))
        gamma = jnp.asarray(20.0, jnp.float32)

        def naive_loss(a, b):
            loss, _ = self_paced_supcon_loss(a, b, gamma=gamma, target=labels,
                                             valid=valid, weight_update="soft")
            return loss

        def fused_loss(a, b):
            loss, _ = fused_self_paced_supcon(a, b, gamma=gamma, target=labels,
                                              valid=valid, weight_update="soft")
            return loss

        row = {"two_n": two_n}
        for name, fn in (("naive", naive_loss), ("fused", fused_loss)):
            step = jax.jit(jax.value_and_grad(fn, argnums=(0, 1)))
            out = step(z1, z2)  # compile
            jax.block_until_ready(out)
            holder = {}

            def run_one():
                holder["out"] = step(z1, z2)
                return holder["out"]

            ms = profile_device_time(run_one, reps=30)
            row[f"{name}_ms"] = ms
            print(f"2N={two_n} {name}: {ms} ms/call", flush=True)
        if row.get("naive_ms") and row.get("fused_ms"):
            row["speedup"] = row["naive_ms"] / row["fused_ms"]
        results.append(row)

    out_path = Path(__file__).resolve().parents[1] / "tmp" / "crossover_r3.json"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
