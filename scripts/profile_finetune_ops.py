#!/usr/bin/env python
"""Per-op device-time breakdown of the supervised finetune step (bench.py
step-matrix `finetune` flavor: 5 labeled slices, UNet-256, ACDC label
policy). Run SOLO on the real TPU:
    python scripts/profile_finetune_ops.py [bfloat16|float32] [batch]
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


def main(dtype_name="bfloat16", batch=5, reps=20):
    import dataclasses
    from spcl_tpu.data import synthetic_dataset
    from spcl_tpu.data.device_store import DeviceStore
    from spcl_tpu.data.augment import ACDC_LABEL
    from spcl_tpu.models import UNet
    from spcl_tpu.training import build_optimizer, create_train_state
    from spcl_tpu.training.steps import build_finetune_step
    from spcl_tpu.utils.profiling import device_ms_per_step, device_op_breakdown

    batch = int(batch)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    policy = dataclasses.replace(ACDC_LABEL, crop=CROP)
    model = UNet(input_dim=1, num_classes=4, max_channel=CH, dtype=dtype)
    optimizer = build_optimizer(name="RAdam", lr=2e-7, weight_decay=1e-5)
    ds = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(10, 14),
                           canvas=CANVAS, seed=0)
    store = DeviceStore.for_dataset(ds)
    sample = jnp.zeros((2, CROP, CROP, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    state = create_train_state(
        model_params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), hook_params={},
        tx=optimizer, teacher=False, base_key=jax.random.PRNGKey(9))

    ft = build_finetune_step(model, optimizer, num_classes=4, policy=policy,
                             store=store)
    rng = np.random.RandomState(0)
    mat = jax.device_put(rng.randint(0, len(ds), size=(200, batch)).astype(np.int32))
    scal = jax.device_put({})

    holder = {"state": state}
    for _ in range(3):
        holder["state"], _m = ft.epoch_step(holder["state"], mat, scal)
    jax.block_until_ready(holder["state"])

    d = tempfile.mkdtemp(prefix="spcl_fttrace_")
    try:
        with jax.profiler.trace(d):
            for _ in range(reps):
                holder["state"], _m = ft.epoch_step(holder["state"], mat, scal)
            jax.block_until_ready(holder["state"])
        ms = device_ms_per_step(d, calls=reps)
        ops = device_op_breakdown(d) or {}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(f"== {dtype_name}@{batch}: {ms} ms/step (device plane)")
    out = {"ms_per_step": ms, "ops": {k: v / reps for k, v in ops.items()}}
    Path(f"tmp/ft_ops_{dtype_name}_{batch}.json").write_text(json.dumps(out))
    for k, v in list(ops.items())[:15]:
        print(f"{v / reps:9.4f} ms  {k[:160]}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or ["bfloat16"]))
