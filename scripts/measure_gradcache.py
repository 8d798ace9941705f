#!/usr/bin/env python
"""Measure gradient-cache chunked pretraining at large 2N on the real TPU.

Three questions, answered on the profiler device plane (the only trustworthy
timing on this relay — RESULTS.md round 2):

1. What does the two-pass schedule cost where direct backprop still fits?
   (direct vs cached at the same 2N; theory says ~4/3, one extra forward)
2. Where does direct backprop stop fitting? (activations ~ all 2N views at
   once; try growing 2N until RESOURCE_EXHAUSTED)
3. What does cached training cost at 2N far beyond that wall?
   (ms/step and slices/s at 2N up to 16384 on ONE 16 GB v5e)

Run SOLO:  python scripts/measure_gradcache.py [quick]
Artifact:  benchmarks/gradcache_r4.json
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CROP, CANVAS, CH = 224, 256, 256
CHUNK_SLICES = 128  # 2N_chunk = 256 views/chunk: ~1.8 GB bf16 activations


def build(batch_slices, num_chunks, dtype=jnp.bfloat16):
    from spcl_tpu.data import synthetic_dataset
    from spcl_tpu.data.device_store import DeviceStore
    from spcl_tpu.data.augment import ACDC_PRETRAIN
    from spcl_tpu.data.samplers import InfiniteRandomSampler
    from spcl_tpu.hooks import SelfPacedINFONCEHook
    from spcl_tpu.models import UNet
    from spcl_tpu.training import build_optimizer, create_train_state
    from spcl_tpu.training.steps import build_pretrain_step
    from spcl_tpu.training.gradcache import build_gradcache_pretrain_step
    from spcl_tpu.models.masking import stage_trainable_mask, stages_from_range

    model = UNet(input_dim=1, num_classes=4, max_channel=CH, dtype=dtype)
    hook = SelfPacedINFONCEHook(name="sp", feature_name="Conv5",
                                contrast_on="partition", begin_value=1e4,
                                end_value=20, mode="soft", max_epoch=80)
    optimizer = build_optimizer(name="RAdam", lr=5e-7, weight_decay=1e-5)
    ds = synthetic_dataset("acdc", num_scans=12, slices_per_scan=(10, 14),
                           canvas=CANVAS, seed=0)
    store = DeviceStore.for_dataset(ds)
    sample = jnp.zeros((2, CROP, CROP, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False, until="Conv5")
    acts = jax.eval_shape(lambda v, x: model.apply(v, x, train=False, until="Conv5"),
                          variables, sample)
    sample_acts = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), acts)
    hook_params = {hook.name: hook.build(jax.random.PRNGKey(1), model, sample_acts)}
    state = create_train_state(model_params=variables["params"],
                               batch_stats=variables.get("batch_stats", {}),
                               hook_params=hook_params, tx=optimizer,
                               base_key=jax.random.PRNGKey(9))
    mask = stage_trainable_mask(variables["params"], stages_from_range(None, "Conv5"))
    kw = dict(policy=ACDC_PRETRAIN, total_freedom=True, until="Conv5",
              grad_mask=mask, store=store)
    if num_chunks:
        step = build_gradcache_pretrain_step(model, [hook], optimizer,
                                             num_chunks=num_chunks, **kw)
    else:
        step = build_pretrain_step(model, [hook], optimizer, **kw)
    it = iter(InfiniteRandomSampler(ds, batch_size=batch_slices, seed=0))
    mat = np.stack([np.asarray(ds.to_global(next(it)), np.int32) for _ in range(4)])
    dev_mat, dev_scal = jax.device_put((mat, {hook.name: hook.epoch_scalars(0)}))
    return step, state, dev_mat, dev_scal


def measure(batch_slices, num_chunks, reps, warmup=2):
    from spcl_tpu.utils.profiling import profile_device_time
    label = f"2N={2 * batch_slices} " + (
        f"cached x{num_chunks} chunks" if num_chunks else "direct")
    try:
        step, state, dev_mat, dev_scal = build(batch_slices, num_chunks)
        for _ in range(warmup):
            state, _ = step.epoch_step(state, dev_mat, dev_scal)
        jax.block_until_ready(state)
        holder = {"state": state, "metrics": None}

        def run_one():
            holder["state"], holder["metrics"] = step.epoch_step(
                holder["state"], dev_mat, dev_scal)
            return holder["state"]

        ms = profile_device_time(run_one, reps=reps)
        # loss from a TIMED step (ADVICE r4: the warmup read was unbound
        # with warmup=0 and stale otherwise)
        loss = float(jax.device_get(holder["metrics"]["reg_loss"]))
        assert np.isfinite(loss), loss
        out = {"label": label, "ms_per_step": ms,
               "slices_per_sec": round(batch_slices * 1000.0 / ms, 1) if ms else None,
               "loss": loss}
        print(json.dumps(out), flush=True)
        return out
    except Exception as e:  # OOM lands here as XlaRuntimeError
        msg = f"{type(e).__name__}: {str(e)[:300]}"
        print(json.dumps({"label": label, "error": msg}), flush=True)
        return {"label": label, "error": msg}


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    quick = "quick" in sys.argv[1:]
    rows = []
    # 1) overhead where direct fits (2N=512: both schedules comfortable)
    rows.append(measure(256, 0, reps=10))
    rows.append(measure(256, 2, reps=10))
    # 2) the direct wall: 2N=2048 fits, 2N=4096 needs ~14 GB of activations
    if not quick:
        rows.append(measure(1024, 0, reps=5))
        rows.append(measure(2048, 0, reps=3))
    # 3) cached far beyond it — chunk=64 slices (128 views) measured fastest
    rows.append(measure(2048, 2048 // 64, reps=3))
    if not quick:
        rows.append(measure(2048, 2048 // CHUNK_SLICES, reps=3))
        rows.append(measure(8192, 8192 // 64, reps=2))
    # merge-preserve: the committed artifact carries rows this invocation may
    # not reproduce (chunk sweeps, pre-warp-block A/B) — never clobber them
    out = Path(__file__).resolve().parents[1] / "benchmarks" / "gradcache_r4.json"
    doc = json.loads(out.read_text()) if out.exists() else {}
    doc.setdefault("chunk_slices", CHUNK_SLICES)
    doc.setdefault("reruns", []).append({"quick": quick, "rows": rows})
    out.write_text(json.dumps(doc, indent=2))
    print(f"merged into {out}")


if __name__ == "__main__":
    main()
