#!/usr/bin/env python
"""Per-op device-time breakdown of the eval step (bench.py step-matrix
`eval` flavor: 12-slice per-scan eval, UNet-256, ACDC val policy).

Round-4 follow-up: the eval program carries no step markers, so the
XLA-Modules fallback (utils/profiling.py) makes it measurable at all; this
script attributes where its device time goes. Run SOLO on the real TPU:
    python scripts/profile_eval_ops.py [bfloat16|float32] [batch]

`batch` > 12 measures the packed-eval geometry (Trainer.packed_eval=batch):
fixed-size programs across scan boundaries.
"""
import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CROP, CANVAS, CH = 224, 256, 256


def main(dtype_name="bfloat16", batch=12, reps=20):
    batch = int(batch)
    import dataclasses
    from spcl_tpu.data import synthetic_dataset
    from spcl_tpu.data.device_store import DeviceStore
    from spcl_tpu.data.augment import ACDC_VAL
    from spcl_tpu.models import UNet
    from spcl_tpu.training.steps import build_eval_step
    from spcl_tpu.utils.profiling import device_ms_per_step, device_op_breakdown

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    val_policy = dataclasses.replace(ACDC_VAL, crop=CROP)
    model = UNet(input_dim=1, num_classes=4, max_channel=CH, dtype=dtype)
    ds = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(10, 14),
                           canvas=CANVAS, seed=0)
    store = DeviceStore.for_dataset(ds)
    sample = jnp.zeros((2, CROP, CROP, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})

    ev = build_eval_step(model, num_classes=4, crop=CROP, store=store,
                         val_policy=val_policy, out_size=CROP)
    rng = np.random.RandomState(0)
    gidx = jax.device_put(rng.randint(0, len(ds), size=(batch,)).astype(np.int32))

    for _ in range(3):
        r = ev(params, stats, gidx)
    jax.block_until_ready(r)

    d = tempfile.mkdtemp(prefix="spcl_evaltrace_")
    try:
        with jax.profiler.trace(d):
            for _ in range(reps):
                r = ev(params, stats, gidx)
            jax.block_until_ready(r)
        ms = device_ms_per_step(d, calls=reps)
        ops = device_op_breakdown(d) or {}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(f"== {dtype_name}@{batch}: {ms} ms/step (device plane) | "
          f"{batch * 1000.0 / ms if ms else float('nan'):.0f} slices/s")
    out = {"ms_per_step": ms, "batch": batch,
           "ops": {k: v / reps for k, v in ops.items()}}
    Path(f"tmp/eval_ops_{dtype_name}_{batch}.json").write_text(json.dumps(out))
    for k, v in list(ops.items())[:15]:
        print(f"{v / reps:9.4f} ms  {k[:160]}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or ["bfloat16"]))
