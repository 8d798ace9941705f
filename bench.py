#!/usr/bin/env python
"""Headline benchmark: self-paced contrastive pretrain step throughput.

Workload = the paper's pinned pretrain configuration (BASELINE.md):
contrastive batch of 10 scans x 3 partitions = 30 slices -> 2N = 60 views,
224x224x1, UNet max_channel=256, SP-InfoNCE on Conv5 with partition
meta-labels, RAdam. One step = on-device two-view augmentation + forward +
self-paced SupCon loss + backward + optimizer update, all in one XLA program.
Measured twice: bf16 compute (the TPU-native headline; quality parity vs f32
is validated in tests/test_bf16.py + RESULTS.md) and f32 (reference parity).
A production-shape row (2N=128 — fills the 128-wide vector lanes, RESULTS.md)
is measured in bf16.

ALL headline numbers come from the PROFILER DEVICE PLANE: on this machine's
relay, wall-clock `block_until_ready` timing is acked before the device
executes (dispatch-ack rate, up to ~300x optimistic — RESULTS.md round 2).
The ack rate is still reported, as an explicitly-named secondary field.

Output: ONE json line with the fields
  metric                      sp_infonce_pretrain_throughput
  value                       DEVICE slices/sec, bf16 parity shape (headline)
  unit                        slices/sec
  vs_baseline                 value / torch-CPU reference-equivalent step
  device_ms_per_step          bf16 parity-shape device ms/step
  device_ms_per_step_f32      f32 parity-shape device ms/step
  device_slices_per_sec_f32   f32 parity-shape device slices/sec
  prod_2n128_ms_per_step      bf16 2N=128 device ms/step
  prod_2n128_slices_per_sec   bf16 2N=128 device slices/sec
  gradcache_2n1024_*          bf16 2N=1024 two-pass cached-gradient step
                              (Trainer.grad_cache, 64-slice chunks)
  finetune_ms_per_step        bf16 supervised finetune step (BASELINE cfg 2)
  semi_ms_per_step            bf16 semi step, MT+consistency hooks (cfg 5)
  semi_slices_per_sec         10 slices (5 lab + 5 unl) per semi step
  prod_finetune_b64_*         bf16 finetune at the production batch (64 —
                              config/specific/production_finetune.yaml)
  prod_semi_b32_*             bf16 semi at the production batch (32+32 —
                              config/specific/production_semi.yaml)
  eval_ms_per_step            bf16 12-slice per-scan eval step (cfg 1)
  eval_packed96_ms_per_step   bf16 96-slice packed-eval program (Trainer.packed_eval)
  dispatch_ack_slices_per_sec relay ack rate (NOT a device measurement)
  flops_per_step              analytic conv FLOPs of the parity-shape step
  tflops / mfu                achieved vs v5e bf16 peak (197 TFLOP/s)
  baseline_goal               status of BASELINE.md's >=3x-V100 target

vs_baseline: ratio against the PyTorch reference-equivalent step measured on
this machine's torch device (CPU — the reference is CUDA/torch and cannot run
on the TPU; its one runnable form here is torch-CPU). The baseline number is
measured once and cached in .bench_ref.json so round-over-round comparisons
track OUR changes only.
"""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent
SCANS, PARTS, CROP, CANVAS, CH = 10, 3, 224, 256, 256
BATCH = SCANS * PARTS  # 30 slices, 60 views
WARMUP, TIMED = 10, 200


def measure_ours(dtype_name="float32", batch_slices=None, time_windows=True,
                 grad_cache=0):
    """Production path: device-resident dataset (DeviceStore) + epoch-batched
    steps (the epoch's index matrix uploads once; each step derives its batch
    and PRNG key on device from state.step — zero per-step H2D traffic).
    batch_slices: None -> the paper's ContrastBatchSampler 30-slice batch;
    an int -> plain infinite sampler at that batch (the 2N=128 prod shape).
    grad_cache: >0 -> the two-pass cached-gradient step at that chunk count
    (training/gradcache.py; the large-global-batch path).
    Returns (ack_rate_slices_per_sec or None, device_ms_per_step or None)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from spcl_tpu.data import synthetic_dataset, create_contrastive_loader
    from spcl_tpu.data.device_store import DeviceStore
    from spcl_tpu.data.augment import ACDC_PRETRAIN
    from spcl_tpu.hooks import SelfPacedINFONCEHook
    from spcl_tpu.models import UNet
    from spcl_tpu.training import build_optimizer, create_train_state
    from spcl_tpu.training.steps import build_pretrain_step
    from spcl_tpu.models.masking import stage_trainable_mask, stages_from_range

    batch = batch_slices or BATCH
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    model = UNet(input_dim=1, num_classes=4, max_channel=CH, dtype=dtype)
    hook = SelfPacedINFONCEHook(name="spinfonce/Conv5/partition", feature_name="Conv5",
                                contrast_on="partition", begin_value=1e4, end_value=20,
                                mode="soft", max_epoch=80)
    optimizer = build_optimizer(name="RAdam", lr=5e-7, weight_decay=1e-5)

    ds = synthetic_dataset("acdc", num_scans=SCANS + 2, slices_per_scan=(10, 14),
                           canvas=CANVAS, seed=0)
    store = DeviceStore.for_dataset(ds)
    sample = jnp.zeros((2, CROP, CROP, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False, until="Conv5")
    acts_shapes = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False, until="Conv5"), variables, sample)
    sample_acts = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), acts_shapes)
    hook_params = {hook.name: hook.build(jax.random.PRNGKey(1), model, sample_acts)}
    state = create_train_state(model_params=variables["params"],
                               batch_stats=variables.get("batch_stats", {}),
                               hook_params=hook_params, tx=optimizer,
                               base_key=jax.random.PRNGKey(9))
    mask = stage_trainable_mask(variables["params"], stages_from_range(None, "Conv5"))
    if grad_cache:
        from spcl_tpu.training.gradcache import build_gradcache_pretrain_step
        step = build_gradcache_pretrain_step(
            model, [hook], optimizer, policy=ACDC_PRETRAIN, total_freedom=True,
            until="Conv5", num_chunks=grad_cache, grad_mask=mask, store=store)
    else:
        step = build_pretrain_step(model, [hook], optimizer, policy=ACDC_PRETRAIN,
                                   total_freedom=True, until="Conv5", grad_mask=mask,
                                   store=store)

    if batch_slices is None:
        loader = create_contrastive_loader(ds, scan_sample_num=SCANS, seed=0)
        it = iter(loader.sampler)
    else:
        from spcl_tpu.data.samplers import InfiniteRandomSampler
        it = iter(InfiniteRandomSampler(ds, batch_size=batch_slices, seed=0))
    mat = np.stack([np.asarray(ds.to_global(next(it)), np.int32) for _ in range(200)])
    dev_mat, dev_scal = jax.device_put((mat, {hook.name: hook.epoch_scalars(0)}))

    for i in range(WARMUP):
        state, metrics = step.epoch_step(state, dev_mat, dev_scal)
    jax.block_until_ready(state)
    ack_rate = None
    if time_windows:
        # dispatch-ack rate through the relay (NOT device time): best of
        # 50-step windows, kept as an explicitly-named secondary field
        window = 50
        rates = []
        for w in range(TIMED // window):
            t0 = time.perf_counter()
            for i in range(window):
                state, metrics = step.epoch_step(state, dev_mat, dev_scal)
            jax.block_until_ready(state)
            rates.append(batch * window / (time.perf_counter() - t0))
        ack_rate = float(max(rates))
    # true device time per step via a profiler trace (ground truth on this
    # relay — RESULTS.md round 2)
    holder = {"state": state}

    def run_one():
        holder["state"], _ = step.epoch_step(holder["state"], dev_mat, dev_scal)
        return holder["state"]

    from spcl_tpu.utils.profiling import profile_device_time
    dev_ms = profile_device_time(run_one)
    assert np.isfinite(float(jax.device_get(metrics["reg_loss"])))
    # a "slice" processed = one 2D slice through the pipeline (2 views each)
    return ack_rate, dev_ms


def measure_step_matrix(dtype_name="bfloat16", *, crop=None, canvas=None,
                        ch=None, warmup=None, reps=20):
    """Device-plane ms/step for the OTHER baseline workloads (BASELINE.md
    configs 1/2/5 — the pretrain configs 3/4 are the headline measurement):

      finetune  supervised step, 5 labeled slices 224^2 (reference
                FineTuneEpocher, semi_seg/epochers/new_epocher.py:241-289;
                batch size config/base.yaml:24-32)
      semi      semi-supervised step with MeanTeacher + Consistency hooks,
                5 labeled + 5 unlabeled (reference SemiSupervisedEpocher,
                new_epocher.py:100-238)
      eval      per-scan eval step, 12 slices (reference EvalEpocher,
                new_epocher.py:56-97)

    Returns {flavor: device_ms_per_step}. A regression anywhere in the step
    zoo is now visible to the driver's BENCH gate, not just the pretrain."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from spcl_tpu.data import synthetic_dataset
    from spcl_tpu.data.device_store import DeviceStore
    from spcl_tpu.data.augment import ACDC_LABEL, ACDC_VAL
    from spcl_tpu.hooks import create_consistency_hook, create_mt_hook
    from spcl_tpu.models import UNet
    from spcl_tpu.training import build_optimizer, create_train_state
    from spcl_tpu.training.steps import (build_eval_step, build_finetune_step,
                                         build_semi_step)
    from spcl_tpu.utils.profiling import profile_device_time

    import dataclasses
    crop = crop or CROP
    canvas = canvas or CANVAS
    ch = ch or CH
    warmup = WARMUP if warmup is None else warmup
    label_policy = dataclasses.replace(ACDC_LABEL, crop=crop)
    val_policy = dataclasses.replace(ACDC_VAL, crop=crop)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    model = UNet(input_dim=1, num_classes=4, max_channel=ch, dtype=dtype)
    optimizer = build_optimizer(name="RAdam", lr=2e-7, weight_decay=1e-5)
    ds = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(10, 14),
                           canvas=canvas, seed=0)
    store = DeviceStore.for_dataset(ds)
    sample = jnp.zeros((2, crop, crop, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)

    hooks = [create_mt_hook(weight=1.0), create_consistency_hook(weight=1.0)]
    from spcl_tpu.hooks import get_individual_hooks
    hooks = get_individual_hooks(*hooks)
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

    def time_epoch_step(step, state, *args):
        holder = {"state": state}

        for _ in range(warmup):
            holder["state"], _m = step.epoch_step(holder["state"], *args)
        jax.block_until_ready(holder["state"])

        def run_one():
            holder["state"], _m = step.epoch_step(holder["state"], *args)
            return holder["state"]

        return profile_device_time(run_one, reps=reps)

    import numpy as _np
    rng = _np.random.RandomState(0)
    out = {}

    def mat(b):
        return jax.device_put(rng.randint(0, len(ds), size=(50, b)).astype(_np.int32))

    scal = jax.device_put({})
    # ---- finetune: reference shape (5 slices) + production shape (64 —
    # measured batch-scaling knee, config/specific/production_finetune.yaml)
    ft = build_finetune_step(model, optimizer, num_classes=4, policy=label_policy,
                             store=store)
    out["finetune"] = time_epoch_step(ft, mk_state(False), mat(5), scal)
    out["prod_finetune_b64"] = time_epoch_step(ft, mk_state(False), mat(64), scal)

    # ---- semi (MT + consistency): reference 5+5 + production 32+32
    # (config/specific/production_semi.yaml)
    semi = build_semi_step(model, hooks, optimizer, num_classes=4,
                           policy=label_policy, store=store)
    out["semi"] = time_epoch_step(semi, mk_state(True), mat(5), mat(5), scal)
    out["prod_semi_b32"] = time_epoch_step(semi, mk_state(True), mat(32), mat(32),
                                           scal)

    # ---- eval (12-slice scan batch; + the packed-eval production geometry,
    # Trainer.packed_eval=96 — RESULTS.md round-4 packed-eval table)
    ev = build_eval_step(model, num_classes=4, crop=crop, store=store,
                         val_policy=val_policy, out_size=crop)
    params, stats = variables["params"], variables.get("batch_stats", {})
    for flavor, b in (("eval", 12), ("eval_packed96", 96)):
        gidx = jax.device_put(rng.randint(0, len(ds), size=(b,)).astype(_np.int32))
        for _ in range(warmup):
            r = ev(params, stats, gidx)
        jax.block_until_ready(r)
        out[flavor] = profile_device_time(lambda: ev(params, stats, gidx), reps=reps)
    return out


def analytic_flops_per_step(batch=BATCH) -> float:
    """Analytic FLOPs of one benched step: UNet encoder Conv1..Conv5 forward
    at batch 2N (two 3x3 convs per stage, maxpool halving between stages),
    x3 for backward (dW + dx), on 2N crops of CROP^2. The projection head
    (60x256 matmuls) and the 120x120 contrastive loss are <0.5% of the conv
    FLOPs and are ignored; so is augmentation (matmul/shift-bound, not the
    dominant MXU work)."""
    chs = [CH // 16, CH // 8, CH // 4, CH // 2, CH]
    b = 2 * batch
    res = CROP
    cin = 1
    fwd = 0.0
    for i, c in enumerate(chs):
        if i:
            res //= 2
        fwd += 2.0 * b * res * res * 9 * (cin * c + c * c)
        cin = c
    return fwd * 3.0


# public peak for TPU v5e: 197 TFLOP/s bf16 (394 int8) per chip
V5E_PEAK_FLOPS = 197e12


def measure_torch_baseline() -> float:
    """Reference-equivalent torch step (written fresh; same math shape):
    UNet encoder-to-Conv5 fwd, projection head, SupCon-with-self-paced-weights
    loss over 2N=60, backward, Adam-family update. CPU."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    def block(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False), nn.BatchNorm2d(cout), nn.ReLU(True),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False), nn.BatchNorm2d(cout), nn.ReLU(True))

    chs = [CH // 16, CH // 8, CH // 4, CH // 2, CH]

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = nn.ModuleList([block(1 if i == 0 else chs[i - 1], chs[i])
                                         for i in range(5)])

        def forward(self, x):
            for i, b in enumerate(self.blocks):
                if i:
                    x = F.max_pool2d(x, 2)
                x = b(x)
            return x

    enc = Encoder()
    proj = nn.Sequential(nn.Linear(CH, 256), nn.LeakyReLU(0.01, True), nn.Linear(256, 256))
    opt = torch.optim.Adam(list(enc.parameters()) + list(proj.parameters()), lr=5e-7)

    x = torch.randn(2 * BATCH, 1, CROP, CROP)
    labels = torch.arange(BATCH).repeat(2) % PARTS

    def one_step():
        opt.zero_grad()
        feats = enc(x)
        z = F.normalize(proj(feats.mean(dim=(2, 3))), dim=1)
        sim = z @ z.t() / 0.07
        sim = sim - sim.max().detach()
        pos = (labels[:, None] == labels[None, :]).float()
        pos = pos - torch.eye(2 * BATCH)
        neg = 1.0 - pos - torch.eye(2 * BATCH)
        exp = sim.exp()
        denom = (exp * (pos + neg)).sum(1, keepdim=True)
        logp = sim - (denom + 1e-16).log()
        with torch.no_grad():
            w = torch.clamp(1 + logp / 20.0, min=0)
            w = torch.max(w, 1 - pos)
        loss = -((logp * w * pos).sum(1) / pos.sum(1)).mean()
        loss.backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    steps = 2
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return BATCH * steps / dt


def cached_baseline() -> float:
    cache = REPO / ".bench_ref.json"
    if cache.exists():
        return json.loads(cache.read_text())["torch_cpu_slices_per_sec"]
    val = measure_torch_baseline()
    cache.write_text(json.dumps({"torch_cpu_slices_per_sec": val,
                                 "note": "reference-equivalent torch step on CPU "
                                         "(reference is CUDA-only; CPU is its only "
                                         "runnable form in this environment)"}))
    return val


def main():
    ack_rate, dev_ms_bf16 = measure_ours("bfloat16")
    _, dev_ms_f32 = measure_ours("float32", time_windows=False)
    _, dev_ms_prod = measure_ours("bfloat16", batch_slices=64,
                                  time_windows=False)  # 2N=128 prod shape
    gc_err = None
    try:
        # large-global-batch path: 2N=1024 two-pass cached grads, 64-slice
        # chunks (training/gradcache.py; big-2N table in RESULTS.md)
        _, dev_ms_gc = measure_ours("bfloat16", batch_slices=512,
                                    time_windows=False, grad_cache=8)
    except Exception as e:  # a broken grad_cache path must be VISIBLE to the gate
        dev_ms_gc = None
        gc_err = f"{type(e).__name__}: {e}"[:200]
    try:
        matrix = measure_step_matrix("bfloat16")
    except Exception:
        matrix = {}
    try:
        base = cached_baseline()
    except Exception:
        base = float("nan")
    flops = analytic_flops_per_step()
    out = {"metric": "sp_infonce_pretrain_throughput",
           "unit": "slices/sec", "flops_per_step": flops}
    if dev_ms_bf16:
        dev_rate = BATCH * 1000.0 / dev_ms_bf16
        out["value"] = round(dev_rate, 1)
        out["device_ms_per_step"] = round(dev_ms_bf16, 3)
        out["tflops"] = round(flops / dev_ms_bf16 / 1e9, 2)
        out["mfu"] = round(flops / dev_ms_bf16 / 1e9 / (V5E_PEAK_FLOPS / 1e12), 4)
    else:
        # no profiler device plane: the ack rate is all we have — labelled
        dev_rate = ack_rate or float("nan")
        out["value"] = round(dev_rate, 1) if dev_rate == dev_rate else None
        out["value_note"] = "NO device plane: value is the relay ack rate (optimistic)"
    vs = dev_rate / base if base == base and base > 0 and dev_rate == dev_rate else None
    out["vs_baseline"] = round(vs, 1) if vs else None
    if dev_ms_f32:
        out["device_ms_per_step_f32"] = round(dev_ms_f32, 3)
        out["device_slices_per_sec_f32"] = round(BATCH * 1000.0 / dev_ms_f32, 1)
    if dev_ms_prod:
        out["prod_2n128_ms_per_step"] = round(dev_ms_prod, 3)
        out["prod_2n128_slices_per_sec"] = round(64 * 1000.0 / dev_ms_prod, 1)
    if dev_ms_gc:
        out["gradcache_2n1024_ms_per_step"] = round(dev_ms_gc, 3)
        out["gradcache_2n1024_slices_per_sec"] = round(512 * 1000.0 / dev_ms_gc, 1)
    elif gc_err:
        out["gradcache_2n1024_error"] = gc_err
    if ack_rate:
        out["dispatch_ack_slices_per_sec"] = round(ack_rate, 1)
    # full baseline step matrix (BASELINE.md configs 1/2/5), device plane bf16
    for flavor, ms in matrix.items():
        if ms:
            out[f"{flavor}_ms_per_step"] = round(ms, 3)
    if matrix.get("semi"):
        # 5 labeled + 5 unlabeled slices per semi step
        out["semi_slices_per_sec"] = round(10 * 1000.0 / matrix["semi"], 1)
    if matrix.get("prod_finetune_b64"):
        out["prod_finetune_b64_slices_per_sec"] = round(
            64 * 1000.0 / matrix["prod_finetune_b64"], 1)
    if matrix.get("prod_semi_b32"):
        out["prod_semi_b32_slices_per_sec"] = round(
            64 * 1000.0 / matrix["prod_semi_b32"], 1)
    # >=3x-V100 goal status, argued as a bound (no V100 exists here):
    # a V100 at its 15.7 TFLOP/s f32 peak needs flops/15.7e12 per step at
    # 100% utilization; typical conv-net utilization is 30-50%.
    v100_bound_ms = flops / 15.7e12 * 1000
    if dev_ms_bf16:
        ratio_vs_perfect = v100_bound_ms / dev_ms_bf16
        out["baseline_goal"] = (
            "BASELINE.md >=3x-V100 target, bound argument (no V100 here; "
            f"vs_baseline is vs torch-CPU): a 100%-utilization V100 needs "
            f"{v100_bound_ms:.1f} ms/step; we run {dev_ms_bf16:.1f} ms = "
            f"{ratio_vs_perfect:.2f}x a PERFECT V100, i.e. >=3x any V100 "
            f"below {ratio_vs_perfect / 3 * 100:.0f}% FLOP utilization "
            "(typical conv-net V100 utilization is 30-50%). At the "
            "lane-aligned production shape the margin roughly doubles "
            "(prod_2n128_* fields).")
    else:
        out["baseline_goal"] = (
            "UNPROVEN (no device plane this run): a 100%-utilization V100 "
            f"would need {v100_bound_ms:.1f} ms/step for comparison.")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
