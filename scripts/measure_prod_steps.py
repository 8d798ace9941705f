#!/usr/bin/env python
"""Batch-scaling curves for the finetune and semi steps on the device plane
(VERDICT r4 item 4 — the 2N=128 pretrain methodology applied to the rest of
the step matrix).

Both steps were measured small-batch-bound at the reference shapes (RESULTS
round 4: finetune 11.648 ms @5 slices, semi 29.449 ms @5+5 — "no dominant
op... the lever is batch"). This script measures device ms/step at growing
batches (bf16, 224^2, max_channel=256) and reports per-slice efficiency; the
winning shapes become config/specific/production_finetune.yaml and
production_semi.yaml and the prod_* fields in bench.py.

Run SOLO on the TPU host (one compile per point: minutes each through the
relay). Output: one JSON line per point + benchmarks/prod_steps_r5.json.
"""
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

CROP, CANVAS, CH = 224, 256, 256
FT_BATCHES = (5, 16, 32, 64)
SEMI_BATCHES = (5, 16, 32)      # per stream: b labeled + b unlabeled


def build_common():
    from spcl_tpu.data import synthetic_dataset
    from spcl_tpu.data.device_store import DeviceStore
    from spcl_tpu.hooks import (create_consistency_hook, create_mt_hook,
                                get_individual_hooks)
    from spcl_tpu.models import UNet
    from spcl_tpu.training import build_optimizer, create_train_state

    model = UNet(input_dim=1, num_classes=4, max_channel=CH, dtype=jnp.bfloat16)
    optimizer = build_optimizer(name="RAdam", lr=2e-7, weight_decay=1e-5)
    ds = synthetic_dataset("acdc", num_scans=10, slices_per_scan=(10, 14),
                           canvas=CANVAS, seed=0)
    store = DeviceStore.for_dataset(ds)
    sample = jnp.zeros((2, CROP, CROP, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    hooks = get_individual_hooks(create_mt_hook(weight=1.0),
                                 create_consistency_hook(weight=1.0))
    acts_shapes = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), variables, sample)
    sample_acts = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), acts_shapes)
    hook_params = {}
    for i, h in enumerate(hooks):
        p = h.build(jax.random.PRNGKey(i + 3), model, sample_acts)
        if p is not None:
            hook_params[h.name] = p

    def mk_state(teacher):
        v = model.init(jax.random.PRNGKey(0), sample, train=False)
        return create_train_state(
            model_params=v["params"], batch_stats=v.get("batch_stats", {}),
            hook_params={k: jax.tree_util.tree_map(jnp.copy, p)
                         for k, p in hook_params.items()},
            tx=optimizer, teacher=teacher, base_key=jax.random.PRNGKey(9))

    return model, optimizer, ds, store, hooks, mk_state


def measure(flavor: str, b: int, ctx, warmup=6, reps=20):
    from spcl_tpu.data.augment import ACDC_LABEL
    from spcl_tpu.training.steps import build_finetune_step, build_semi_step
    from spcl_tpu.utils.profiling import profile_device_time

    model, optimizer, ds, store, hooks, mk_state = ctx
    policy = dataclasses.replace(ACDC_LABEL, crop=CROP)
    rng = np.random.RandomState(0)
    mat = jax.device_put(rng.randint(0, len(ds), size=(50, b)).astype(np.int32))
    scal = jax.device_put({})
    try:
        if flavor == "finetune":
            step = build_finetune_step(model, optimizer, num_classes=4,
                                       policy=policy, store=store)
            args = (mat, scal)
            state = mk_state(False)
            slices = b
        else:
            step = build_semi_step(model, hooks, optimizer, num_classes=4,
                                   policy=policy, store=store)
            mat_u = jax.device_put(
                rng.randint(0, len(ds), size=(50, b)).astype(np.int32))
            args = (mat, mat_u, scal)
            state = mk_state(True)
            slices = 2 * b
        holder = {"state": state, "metrics": None}
        for _ in range(warmup):
            holder["state"], holder["metrics"] = step.epoch_step(
                holder["state"], *args)
        jax.block_until_ready(holder["state"])

        def run_one():
            holder["state"], holder["metrics"] = step.epoch_step(
                holder["state"], *args)
            return holder["state"]

        ms = profile_device_time(run_one, reps=reps)
        loss_key = "sup_loss" if "sup_loss" in holder["metrics"] else \
            sorted(holder["metrics"])[0]
        loss = float(jax.device_get(holder["metrics"][loss_key]))
        assert np.isfinite(loss), loss
        rec = {"flavor": flavor, "batch": b, "slices": slices,
               "device_ms_per_step": round(ms, 3) if ms else None,
               "slices_per_sec": round(slices * 1000.0 / ms, 1) if ms else None,
               "ms_per_slice": round(ms / slices, 4) if ms else None}
    except Exception as e:
        rec = {"flavor": flavor, "batch": b,
               "error": f"{type(e).__name__}: {str(e)[:250]}"}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    ctx = build_common()
    recs = []
    for b in FT_BATCHES:
        recs.append(measure("finetune", b, ctx))
    for b in SEMI_BATCHES:
        recs.append(measure("semi", b, ctx))
    out = ROOT / "benchmarks" / "prod_steps_r5.json"
    out.write_text(json.dumps({"crop": CROP, "max_channel": CH,
                               "dtype": "bfloat16", "points": recs}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
