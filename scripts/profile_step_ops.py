#!/usr/bin/env python
"""Per-op device-time breakdown of the benched pretrain step (VERDICT r2
item 2: harvest the stage-1/2 lane-utilization headroom — first measure
where the 23.4ms f32 / 18.6ms bf16 actually goes, including the round-3
rotation-pad warp change).

Profiles the exact bench.py workload (2N=60 SP-InfoNCE pretrain step,
UNet-256, ACDC policy) for each requested dtype, prints total device
ms/step + the top XLA ops. Run SOLO on the real TPU:
    python scripts/profile_step_ops.py [float32 bfloat16]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SCANS, PARTS, CROP, CANVAS, CH = 10, 3, 224, 256, 256


def build(dtype, layout="nhwc", batch_slices=None):
    from spcl_tpu.data import synthetic_dataset, create_contrastive_loader
    from spcl_tpu.data.device_store import DeviceStore
    from spcl_tpu.data.augment import ACDC_PRETRAIN
    from spcl_tpu.hooks import SelfPacedINFONCEHook
    from spcl_tpu.models import UNet
    from spcl_tpu.training import build_optimizer, create_train_state
    from spcl_tpu.training.steps import build_pretrain_step
    from spcl_tpu.models.masking import stage_trainable_mask, stages_from_range

    model = UNet(input_dim=1, num_classes=4, max_channel=CH, dtype=dtype,
                 small_c_layout=layout)
    hook = SelfPacedINFONCEHook(name="sp", feature_name="Conv5",
                                contrast_on="partition", begin_value=1e4,
                                end_value=20, mode="soft", max_epoch=80)
    optimizer = build_optimizer(name="RAdam", lr=5e-7, weight_decay=1e-5)
    ds = synthetic_dataset("acdc", num_scans=SCANS + 2, slices_per_scan=(10, 14),
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
    step = build_pretrain_step(model, [hook], optimizer, policy=ACDC_PRETRAIN,
                               total_freedom=True, until="Conv5", grad_mask=mask,
                               store=store)
    if batch_slices is None:
        loader = create_contrastive_loader(ds, scan_sample_num=SCANS, seed=0)
        it = iter(loader.sampler)
    else:  # production shape (2N = 2*batch_slices), plain infinite sampler
        from spcl_tpu.data.samplers import InfiniteRandomSampler
        it = iter(InfiniteRandomSampler(ds, batch_size=batch_slices, seed=0))
    mat = np.stack([np.asarray(ds.to_global(next(it)), np.int32) for _ in range(50)])
    dev_mat, dev_scal = jax.device_put((mat, {hook.name: hook.epoch_scalars(0)}))
    return step, state, dev_mat, dev_scal


def main():
    import shutil
    import tempfile
    from spcl_tpu.utils.profiling import device_ms_per_step, device_op_breakdown

    assert jax.default_backend() == "tpu", jax.default_backend()
    # args: dtype[:layout][@batch] e.g. "bfloat16:nchw float32 bfloat16@64"
    # (@64 = production shape: plain 64-slice sampler -> 2N=128)
    specs = sys.argv[1:] or ["float32", "bfloat16"]
    results = {}
    for spec in specs:
        head, _, batch = spec.partition("@")
        name, _, layout = head.partition(":")
        layout = layout or "nhwc"
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]
        step, state, dev_mat, dev_scal = build(dtype, layout,
                                               batch_slices=int(batch) if batch else None)
        name = spec
        for _ in range(5):  # compile + settle
            state, _ = step.epoch_step(state, dev_mat, dev_scal)
        jax.block_until_ready(state)
        d = tempfile.mkdtemp(prefix=f"spcl_ops_{name}_")
        try:
            with jax.profiler.trace(d):
                for _ in range(20):
                    state, _ = step.epoch_step(state, dev_mat, dev_scal)
                jax.block_until_ready(state)
            ms = device_ms_per_step(d)
            ops = device_op_breakdown(d)
            results[name] = {"ms_per_step": ms, "ops": None}
            print(f"== {name}: {ms} ms/step (device plane)", flush=True)
            if ops:
                per_step = {k: v / 20.0 for k, v in ops.items()}
                results[name]["ops"] = per_step
                for k, v in list(per_step.items())[:40]:
                    print(f"  {v:8.3f} ms  {k}", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    tag = "_".join(s.replace(":", "-") for s in specs)
    out = Path(__file__).resolve().parents[1] / "tmp" / f"step_ops_{tag}.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
