"""Trainers: outer epoch loops around the jitted steps.

Capability parity with reference contrastyou/trainer/base.py:23-155 +
semi_seg/trainers/new_trainer.py:17-120 + new_pretrain.py:18-110:

- `init()` builds the optimizer (RAdam + warmup-x-multiplier->cosine over
  epochs) over model AND hook (projector) params, the TrainState, and the
  jitted steps;
- `register_hooks` before init; hook activation is config-driven;
- epoch loop: train epoch -> val + test eval -> `best.ckpt` on val-score
  improvement + `last.ckpt` always -> CSV storage flush -> hook epoch-end;
- pretrain trainers skip eval and save `last.ckpt` each epoch;
- full-state resume + model-only warm start.

TPU specifics: meters consume one bulk `jax.device_get` per step; augmentation
is inside the step; the per-epoch gamma/lr scalars enter as traced values.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import load_checkpoint, load_model_params, save_checkpoint
from .optim import build_optimizer
from .state import TrainState, create_train_state
from .steps import (build_adversarial_step, build_eval_step, build_finetune_step,
                    build_pretrain_step, build_semi_step)
from ..data.augment import POLICY_ZOO, AugmentPolicy
from ..data.device_store import DeviceStore
from ..data.loader import HostLoader
from ..hooks.base import TrainerHook, get_individual_hooks
from ..meters import AverageValueMeter, MeterInterface, Storage, UniversalDice
from ..meters.display import meter_display
from ..models.discriminator import Discriminator
from ..models.masking import stage_trainable_mask
from ..models.unet import UNet
from ..schedulers.lr import warmup_cosine_epoch_schedule
from ..utils.rng import KeyChain
from ..utils.utils import get_logger, yaml_write

logger = get_logger("trainer")

# In-process step cache. Each build_* call creates a fresh closure, which jax
# traces/compiles anew even for an identical program — and the compile relay
# in this environment takes minutes per program with no working persistent
# cache. Trainers with identical step-defining configuration (the finetune
# sweep: same model/optimizer/policy, different data) share one compiled step.
_STEP_CACHE: Dict = {}


def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


class Trainer:
    """Base supervised/semi-supervised trainer."""
    activate_hooks = True
    train_meter_focus = "tra"
    uses_unlabeled = True  # semi consumes an unlabeled stream; FineTune doesn't

    def __init__(self, *, model: UNet, labeled_loader: HostLoader,
                 unlabeled_loader: Optional[HostLoader], val_loader: HostLoader,
                 test_loader: Optional[HostLoader], save_dir: str,
                 max_epoch: int = 100, num_batches: int = 100,
                 config: Optional[Dict] = None, seed: int = 10,
                 crop: int = 224, data_name: str = "acdc",
                 two_stage: bool = False, disable_bn: bool = False,
                 device_data: bool = True, defer_reads: bool = False,
                 mesh=0):
        # device_data: keep the packed datasets resident in HBM and gather
        # batches by index inside the jitted step (the reference's datasets
        # are all <1GB packed). Per-step H2D traffic drops to an index
        # vector. Set False to stream host batches (arbitrarily large data).
        self._device_data = bool(device_data)
        # defer_reads: run the WHOLE training without a single device->host
        # read — metrics stay futures, the val score is computed on device,
        # and best-checkpoint selection happens in a jitted compare that keeps
        # the best params in HBM. One bulk drain at the end reconstructs every
        # epoch's meters/storage. Motivation: minimal host sync is the right
        # TPU shape anyway, and this environment's device link permanently
        # degrades dispatch ~60-400x after the first read (CLAUDE.md).
        # Trade-off: checkpoints are only durable at the end of the run.
        self._defer_reads = bool(defer_reads)
        # mesh: multi-chip data parallelism (SURVEY §2.11/§5.8 — the
        # reference's DDP is vestigial scaffolding; here it's native).
        # 0/None = single device; "auto" = all visible devices; N = first N.
        # The TrainState replicates, batches shard on axis 0 (batches pad to
        # a device multiple with valid=0), and GSPMD inserts the gradient
        # psum + contrastive-embedding all_gather over ICI.
        self._mesh_spec = mesh
        self._mesh = None
        self._mh_gather = None
        self._model = model
        self._labeled_loader = labeled_loader
        self._unlabeled_loader = unlabeled_loader
        self._val_loader = val_loader
        self._test_loader = test_loader
        self._save_dir = str(save_dir)
        self._max_epoch = int(max_epoch)
        self._num_batches = int(num_batches)
        self._config = config or {}
        self._crop = int(crop)
        self._data_name = data_name
        self._two_stage = bool(two_stage)
        self._disable_bn = bool(disable_bn)
        self._hooks: List[TrainerHook] = []
        self._keychain = KeyChain(seed)
        # Multi-host: every process trains (replicated state, sharded
        # batches); only process 0 touches the filesystem — checkpoints,
        # CSV storage, TB events, progress lines (reference _DDPMixin
        # on_master gating, contrastyou/trainer/base.py:23-47).
        from ..parallel import on_master
        self._is_master = on_master()
        self._storage = Storage(save_dir=self._save_dir if self._is_master
                                else None)
        from ..writer import NullWriter, SummaryWriter
        self._writer = (SummaryWriter(log_dir=self._save_dir)
                        if self._is_master else NullWriter())
        self._cur_epoch = 0
        self._best_score = -np.inf
        self._trainable_stages: Optional[List[str]] = None
        self.__initialized__ = False
        if self._config and self._is_master:
            # config + git hash per run dir (reference trainer/_io.py:54-60,
            # contrastyou/__init__.py:10-17)
            from ..utils.utils import gethash
            yaml_write({**self._config, "githash": gethash()},
                       self._save_dir, "config.yaml")

    # ----------------------------------------------------------------- registration
    def register_hooks(self, *hooks: TrainerHook) -> None:
        if self.__initialized__:
            raise RuntimeError("register_hooks must be called before init()")
        self._hooks.extend(get_individual_hooks(*hooks))

    def set_trainable_stages(self, stages: Sequence[str]) -> None:
        """Functional `set_grad` (reference arch/unet.py:242-259)."""
        self._trainable_stages = list(stages)

    # ----------------------------------------------------------------- init
    # reference get_data (semi_seg/data/creator.py:25-33): pretrain=True uses
    # the strong "pretrain" transforms; everything else (semi/finetune/mixup/
    # adv) trains on the "label" transforms. _PretrainTrainer overrides.
    policy_kind = "label"

    def _zoo_policy(self, kind: str) -> AugmentPolicy:
        import dataclasses
        policy = POLICY_ZOO[self._data_name][kind]
        if policy.crop != self._crop:
            # keep resize targets self-similar under a crop override (a
            # Resize(crop)-style policy stays Resize(new_crop))
            resize = policy.resize
            if resize == policy.crop:
                resize = self._crop
            elif resize == (policy.crop, policy.crop):
                resize = (self._crop, self._crop)
            policy = dataclasses.replace(policy, crop=self._crop, resize=resize)
        return policy

    @property
    def train_policy(self) -> AugmentPolicy:
        return self._zoo_policy(self.policy_kind)

    @property
    def val_policy(self) -> AugmentPolicy:
        return self._zoo_policy("val")

    def _sample_image_shape(self):
        imgs = self._labeled_loader.dataset.images
        canvas = imgs.shape[1]
        channels = imgs.shape[3] if imgs.ndim == 4 else 1
        return (2, canvas, canvas, channels)

    def _build_mesh(self):
        spec = self._mesh_spec
        if spec is None or spec == 0 or spec is False:
            return None
        from ..parallel import make_mesh
        n = None if spec in ("auto", True) else int(spec)
        mesh = make_mesh(n)
        if mesh.devices.size == 1:
            return None  # one device: the plain path is the same program
        logger.info("data mesh over %d devices: %s", mesh.devices.size,
                    [d.id for d in mesh.devices.flat])
        return mesh

    # ---- mesh plumbing ----------------------------------------------------
    @property
    def n_shards(self) -> int:
        return 1 if self._mesh is None else int(self._mesh.devices.size)

    def _pad_multiple(self, idx: np.ndarray) -> np.ndarray:
        """Right-pad the batch axis (last dim) with -1 to a device multiple.
        Pad entries carry valid=0 through every loss/meter (gather_from)."""
        n = self.n_shards
        rem = (-idx.shape[-1]) % n
        if rem == 0:
            return idx
        pad = np.full(idx.shape[:-1] + (rem,), -1, idx.dtype)
        return np.concatenate([idx, pad], axis=-1)

    def _put_batch(self, tree, batch_dims: int = 1):
        """Host -> device with axis-(batch_dims-1) data sharding under the
        mesh (batch_dims=2: [num_batches, B] epoch matrices shard on axis 1).
        Multi-host safe: every process computes the same global batch (the
        samplers are seed-deterministic) and ingests only its own shards
        (parallel/mesh.py::put_tree)."""
        if self._mesh is None:
            return jax.device_put(tree)
        from jax.sharding import PartitionSpec as P
        from ..parallel import put_tree
        spec = P("data") if batch_dims == 1 else P(None, "data")
        return put_tree(tree, self._mesh, spec)

    def _put_replicated(self, tree):
        if self._mesh is None:
            return jax.device_put(tree)
        from ..parallel import replicate
        return replicate(tree, self._mesh)

    def _fetch(self, tree):
        """device_get that works on multi-host meshes: step outputs may carry
        batch-sharded leaves (per-slice dice stats, probe matrices) that are
        not fully addressable from any one process — an identity jit with
        replicated out_shardings all_gathers them first. Single-process:
        plain device_get."""
        if self._mesh is None or jax.process_count() == 1:
            return jax.device_get(tree)
        if self._mh_gather is None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._mh_gather = jax.jit(
                lambda t: t, out_shardings=NamedSharding(self._mesh, P()))
        return jax.device_get(self._mh_gather(tree))

    def init(self) -> None:
        self._mesh = self._build_mesh()
        if self._mesh is not None and getattr(self._model, "small_c_layout",
                                              "nhwc") in ("pallas", "packed"):
            # pallas_call has no GSPMD partitioning rule: under a mesh the
            # stage kernels would be silently replicated (full-batch compute
            # per chip) or fail to compile. The plain layouts partition.
            raise ValueError(
                f"UNet.small_c_layout={self._model.small_c_layout!r} is "
                "incompatible with Trainer.mesh — use 'nhwc' or 'nchw'")
        optim_cfg = dict(self._config.get("Optim", {}))
        sched_cfg = self._config.get("Scheduler")
        base_lr = float(optim_cfg.get("lr", 1e-7))
        if sched_cfg:
            self._lr_schedule = warmup_cosine_epoch_schedule(
                base_lr=base_lr, multiplier=float(sched_cfg.get("multiplier", 300)),
                warmup_max=int(sched_cfg.get("warmup_max", 10)),
                max_epoch=self._max_epoch, steps_per_epoch=self._num_batches)
        else:
            self._lr_schedule = lambda step: jnp.asarray(base_lr, jnp.float32)
            self._lr_schedule.host = lambda step: base_lr
        self._optimizer = build_optimizer(
            name=optim_cfg.get("name", "RAdam"), lr=self._lr_schedule,
            weight_decay=float(optim_cfg.get("weight_decay", 0.0)),
            momentum=float(optim_cfg.get("momentum", 0.9)),
            nesterov=bool(optim_cfg.get("nesterov", False)))

        # model + hook params
        key = self._keychain.next()
        k_model, k_hooks = jax.random.split(key)
        sample = jnp.zeros(self._sample_image_shape(), jnp.float32)
        # pretrain trainers stop the traced program at `forward_until`, so
        # only those stages' params exist: the optimizer never touches (or
        # allocates moments for) stages the phase cannot train
        init_until = getattr(self, "_init_until", None)
        sample_in = sample[:, :self._crop, :self._crop]
        # NOTE: init must run on the accelerator — device_put of CPU-committed
        # params poisons the step compile with host layouts (measured 900x
        # step slowdown on the v5e tunnel).
        variables = self._model.init(k_model, sample_in, train=False, until=init_until)
        model_params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        ckpt = (self._config.get("Arch") or {}).get("checkpoint")
        if ckpt:
            model_params, batch_stats = load_model_params(
                ckpt, {"params": model_params, "batch_stats": batch_stats})
            logger.info("warm-started model weights from %s", ckpt)

        # hooks only need activation SHAPES to build their projectors —
        # eval_shape avoids compiling a throwaway forward program
        acts_shapes = jax.eval_shape(
            lambda v, x: self._model.apply(v, x, train=False, until=init_until),
            {"params": model_params, "batch_stats": batch_stats}, sample_in)
        sample_acts = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), acts_shapes)
        hook_params = {}
        for i, h in enumerate(self._hooks):
            p = h.build(jax.random.fold_in(k_hooks, i), self._model, sample_acts)
            if p is not None:
                hook_params[h.name] = p

        grad_mask = None
        if self._trainable_stages is not None:
            grad_mask = stage_trainable_mask(model_params, self._trainable_stages)
        self._grad_mask = grad_mask

        needs_teacher = any(h.needs_teacher for h in self._hooks)
        self._state = self._create_state(model_params, batch_stats, hook_params,
                                         needs_teacher)
        if self._mesh is not None:
            self._state = self._put_replicated(self._state)
        self._build_steps()
        self.__initialized__ = True

    def _create_state(self, model_params, batch_stats, hook_params, needs_teacher):
        return create_train_state(model_params=model_params, batch_stats=batch_stats,
                                  hook_params=hook_params, tx=self._optimizer,
                                  teacher=needs_teacher,
                                  base_key=jnp.asarray(self._keychain.next()))

    @staticmethod
    def _hook_cache_key(h: TrainerHook):
        items = tuple(sorted(
            (k, v) for k, v in vars(h).items()
            if isinstance(v, (str, int, float, bool, tuple, type(None)))))
        return (type(h).__name__, items)

    def _train_store(self):
        if not self._device_data:
            return None
        return DeviceStore.for_dataset(self._labeled_loader.dataset, mesh=self._mesh)

    def _eval_store(self):
        if not self._device_data:
            return None
        return DeviceStore.for_dataset(self._val_loader.dataset, mesh=self._mesh)

    def _eval_out_size(self) -> int:
        """Static eval canvas. Shortest-side val policies (Resize(int)) can
        produce frames longer than `crop` on one side of non-square slices;
        size the canvas from the datasets' stored extents (square data ->
        crop, today's behavior)."""
        pol = self.val_policy
        if not isinstance(pol.resize, int):
            return self._crop
        out = self._crop
        for loader in (self._val_loader, self._test_loader):
            if loader is None:
                continue
            sizes = np.asarray(loader.dataset.sizes, np.float64)
            short = sizes.min(axis=1)
            long = sizes.max(axis=1)
            out = max(out, int(np.max(np.floor(pol.resize * long / short))))
        # UNet's decoder upsamples by exact x2 per stage: keep every pooled
        # dim even (4 pool levels -> multiple of 16); extra padding is masked
        return ((out + 15) // 16) * 16

    def _step_cache_key(self, flavor: str):
        hooks = self._hooks if self.activate_hooks else []
        store = self._train_store() if flavor != "eval" else self._eval_store()
        return (
            flavor, self._model,
            None if self._mesh is None else tuple(d.id for d in self._mesh.devices.flat),
            id(store.images) if store is not None else None,
            _freeze(self._config.get("Optim", {})),
            _freeze(self._config.get("Scheduler", {})),
            self._max_epoch, self._num_batches, self.train_policy,
            self.val_policy, self._crop, self._eval_out_size(),
            self._two_stage, self._disable_bn,
            tuple(self._trainable_stages) if self._trainable_stages else None,
            tuple(self._hook_cache_key(h) for h in hooks),
        )

    def _cached_step(self, flavor: str, builder):
        key = self._step_cache_key(flavor)
        if key not in _STEP_CACHE:
            _STEP_CACHE[key] = builder()
        else:
            logger.debug("reusing compiled %s step", flavor)
        return self._mh_wrap_step(_STEP_CACHE[key], flavor)

    def _mh_wrap_step(self, fn, tag: str):
        """Multi-host only: barrier across processes before a step's FIRST
        invocation. Host-side python/init skew between processes (config/TB
        writes, dataset packing, earlier compiles) otherwise lets one
        process EXECUTE a collective while a peer is still COMPILING the
        same program — CPU-gloo context init gives up after 30s (observed).
        After the barrier both processes compile the same program on
        identical inputs, so residual skew is compile-time variance only.
        Single-process: returned unchanged."""
        if self._mesh is None or jax.process_count() == 1:
            return fn
        from ..parallel.mesh import host_barrier

        def sync_first(f, t):
            done = []

            def wrapped(*args, **kwargs):
                if not done:
                    host_barrier(f"step:{t}")
                    done.append(True)
                return f(*args, **kwargs)
            return wrapped

        out = sync_first(fn, tag)
        if hasattr(fn, "epoch_step"):
            out.epoch_step = sync_first(fn.epoch_step, tag + ":epoch")
        return out

    def _build_steps(self) -> None:
        num_classes = self._model.num_classes
        hooks = self._hooks if self.activate_hooks else []
        self._train_step = self._cached_step("semi", lambda: build_semi_step(
            self._model, hooks, self._optimizer, num_classes=num_classes,
            policy=self.train_policy, grad_mask=self._grad_mask,
            two_stage=self._two_stage, disable_bn=self._disable_bn,
            store=self._train_store(), mesh=self._mesh))
        self._eval_step = self._cached_step("eval", lambda: build_eval_step(
            self._model, num_classes=num_classes, crop=self._crop,
            store=self._eval_store(), val_policy=self.val_policy,
            out_size=self._eval_out_size()))

    # ----------------------------------------------------------------- epochs
    def _hook_scalars(self) -> Dict[str, Dict[str, float]]:
        # _cur_epoch is 1-based; the reference reads scheduler.value at
        # internal epoch 0 on the first epoch and steps it afterwards
        # (semi_seg/hooks/infonce.py:133-136), so epoch e uses get_value(e-1):
        # epoch 1 == begin_value and get_value(max_epoch) is never reached.
        # Hooks' on_epoch_end() still steps their internal counter, which
        # mirrors the same 0-based clock for state_dict parity.
        return {h.name: h.epoch_scalars(self._cur_epoch - 1) for h in self._hooks}

    def _configure_train_meters(self, meters: MeterInterface) -> None:
        C = self._model.num_classes
        report = list(range(1, C))
        meters.register_meter("lr", AverageValueMeter())
        meters.register_meter("sup_loss", AverageValueMeter())
        meters.register_meter("reg_loss", AverageValueMeter())
        meters.register_meter("sup_dice", UniversalDice(C, report_axises=report))

    def _labeled_groups(self, batch) -> List[str]:
        scans = self._labeled_loader.dataset.unique_scans
        return [scans[i] if i >= 0 else "<pad>" for i in np.asarray(batch["scan_idx"])]

    def _run_train_epoch(self) -> Dict:
        meters = MeterInterface(default_focus=self.train_meter_focus)
        with meters.focus_on(self.train_meter_focus):
            self._configure_train_meters(meters)
        scalars = self._hook_scalars()
        # metrics stay as device futures during the epoch (no per-step host
        # sync — a host round trip would serialize the async dispatch queue);
        # one bulk device_get drains them at epoch end
        pending = []
        if self._device_data and hasattr(self._train_step, "epoch_step"):
            # epoch-batched mode: the WHOLE epoch's index matrices + hook
            # scalars upload once; each step is a single execute RPC (the
            # device link charges a full round trip per transfer)
            host_mats, dev_args = self._epoch_matrices(scalars)
            t0 = time.time()
            last = [t0]
            spb = self._epoch_slices() // max(self._num_batches, 1)
            for b in range(self._num_batches):
                self._state, metrics = self._train_step.epoch_step(self._state, *dev_args)
                pending.append((metrics, host_mats[0][b]))
                self._progress(b, t0, last, spb)
        else:
            lab_iter, unl_iter = self._train_streams()
            t0 = time.time()
            last = [t0]
            spb = self._epoch_slices() // max(self._num_batches, 1)
            for b in range(self._num_batches):
                batch_l = next(lab_iter)
                key = self._keychain.next()
                self._state, metrics = self._train_dispatch(batch_l, unl_iter, key, scalars)
                pending.append((metrics, self._group_token(batch_l)))
                self._progress(b, t0, last, spb)
        jax.block_until_ready(self._state)
        elapsed = time.time() - t0
        # stack the epoch's metrics ON DEVICE and fetch once: the device link
        # charges a round trip per buffer, so fetching N-step dicts separately
        # costs hundreds of RPCs
        metric_list = [m for m, _ in pending]
        stacked = self._fetch(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *metric_list))
        for b, (_, token) in enumerate(pending):
            metrics = jax.tree_util.tree_map(lambda x: x[b], stacked)
            groups, valid = self._groups_and_valid(token)
            self._consume_train_metrics(meters, metrics, groups, {"valid": valid})
        with meters.focus_on(self.train_meter_focus):
            meters["lr"].add(self._host_lr())
        stats = meters.statistics()
        stats.setdefault(self.train_meter_focus, {})["throughput"] = {
            "slices_per_sec": self._epoch_slices() / max(elapsed, 1e-9)}
        return stats

    def _host_lr(self) -> float:
        step = max((self._cur_epoch - 1), 0) * self._num_batches
        return float(self._lr_schedule.host(step))

    def _progress(self, b: int, t0: float, last: list, slices_per_batch: int,
                  period: float = 10.0) -> None:
        """In-epoch progress line (reference mytqdm in-epoch rate display,
        contrastyou/mytqdm/mytqdm.py:38-57): every `period` seconds, log
        batch index + dispatch rate. (On relayed backends the dispatch rate
        is an upper bound — the epoch summary carries the real one.)"""
        now = time.time()
        if now - last[0] < period or not self._is_master:
            return
        last[0] = now
        rate = (b + 1) / max(now - t0, 1e-9)
        eta = (self._num_batches - b - 1) / max(rate, 1e-9)
        logger.info("epoch %03d | batch %d/%d | %.1f it/s (~%.0f slices/s dispatch) | ETA %02d:%02d",
                    self._cur_epoch, b + 1, self._num_batches, rate,
                    rate * slices_per_batch, int(eta) // 60, int(eta) % 60)

    def _index_matrix(self, loader) -> np.ndarray:
        ds = loader.dataset
        it = iter(loader.sampler)
        rows = [np.asarray(ds.to_global(next(it)), np.int32)
                for _ in range(self._num_batches)]
        return self._pad_multiple(np.stack(rows))

    def _epoch_matrices(self, scalars):
        """(host_matrices, device_step_args) for the epoch-batched fast path."""
        mat_l = self._index_matrix(self._labeled_loader)
        host = [mat_l]
        if self.uses_unlabeled and self._unlabeled_loader is not None:
            mat_u = self._index_matrix(self._unlabeled_loader)
            host.append(mat_u)
            dev = (self._put_batch(mat_l, 2), self._put_batch(mat_u, 2),
                   self._put_replicated(scalars))
            return host, dev
        dev = (self._put_batch(mat_l, 2), self._put_replicated(scalars))
        return host, dev

    def _train_streams(self):
        """(labeled, unlabeled) batch streams for one epoch.

        device_data: yield GLOBAL index vectors (the step gathers in HBM);
        otherwise: host batches with depth-3 device prefetch."""
        from itertools import islice
        from ..data.loader import device_prefetch

        if self._device_data:
            def idx_stream(loader):
                ds = loader.dataset
                for local in loader.sampler:
                    yield self._pad_multiple(np.asarray(ds.to_global(local), np.int32))

            lab = idx_stream(self._labeled_loader)
            unl = (idx_stream(self._unlabeled_loader)
                   if self._unlabeled_loader is not None else None)
            return lab, unl
        sharding = None
        batches = iter  # plain loader iteration off-mesh
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(self._mesh, P("data"))

            def batches(loader):  # noqa: F811 — mesh: pad to a device multiple
                for local in loader.sampler:
                    yield loader.dataset.batch(self._pad_multiple(np.asarray(local)))
        lab = device_prefetch(
            islice(batches(self._labeled_loader), self._num_batches), depth=3,
            device=sharding)
        unl = (device_prefetch(
            islice(batches(self._unlabeled_loader), self._num_batches), depth=3,
            device=sharding)
            if self._unlabeled_loader is not None else None)
        return lab, unl

    def _group_token(self, batch_l):
        if self._device_data:
            return batch_l  # the global index vector (host numpy)
        return (batch_l["scan_idx"], batch_l["valid"])

    def _groups_and_valid(self, token):
        if self._device_data:
            idx = np.asarray(token)
            root = self._labeled_loader.dataset.root
            groups = [root.scan_names[i] if i >= 0 else "<pad>" for i in idx]
            return groups, (idx >= 0).astype(np.float32)
        scan_idx, valid = self._fetch(token)
        return self._labeled_groups({"scan_idx": scan_idx}), valid

    def _epoch_slices(self) -> int:
        per = self._labeled_loader.sampler._batch_size if hasattr(
            self._labeled_loader.sampler, "_batch_size") else 0
        if self._unlabeled_loader is not None and hasattr(
                self._unlabeled_loader.sampler, "_batch_size"):
            per += 2 * self._unlabeled_loader.sampler._batch_size
        return per * self._num_batches

    def _dispatch_batch(self, batch):
        """Mesh: index vectors / host batches shard on the data axis before
        entering the step (plain jit placement otherwise)."""
        if self._mesh is None or batch is None:
            return batch
        import numpy as _np
        if isinstance(batch, _np.ndarray):
            return self._put_batch(batch)
        return batch  # host-streaming batches are sharded by the prefetcher

    def _train_dispatch(self, batch_l, unl_iter, key, scalars):
        batch_u = next(unl_iter)
        return self._train_step(self._state, self._dispatch_batch(batch_l),
                                self._dispatch_batch(batch_u), key, scalars)

    def _consume_train_metrics(self, meters, metrics, groups, batch_l) -> None:
        m = self._fetch(metrics)
        # reference raises immediately on NaN loss (contrast_loss3.py:108-109)
        if not np.isfinite(m["sup_loss"]) or not np.isfinite(m.get("reg_loss", 0.0)):
            raise RuntimeError(f"non-finite loss at step {int(self._state.step)}: "
                               f"sup={m['sup_loss']} reg={m.get('reg_loss')}")
        with meters.focus_on(self.train_meter_focus):
            meters["sup_loss"].add(float(m["sup_loss"]))
            if "reg_loss" in m:
                meters["reg_loss"].add(float(m["reg_loss"]))
            keep = np.asarray(batch_l["valid"]).astype(bool)
            meters["sup_dice"].add(m["inter"][keep], m["union"][keep],
                                   group_name=[g for g, k in zip(groups, keep) if k])
        for name, hm in m.get("hooks", {}).items():
            with meters.focus_on(name):
                for k, v in hm.items():
                    if k not in meters:  # hook meters register on first use
                        meters.register_meter(k, AverageValueMeter())
                    meters[k].add(float(v))

    def _eval_batches(self, loader: HostLoader):
        """Host-streaming eval batches with device prefetch (mesh: padded to
        a device multiple + axis-0 sharded)."""
        from ..data.loader import device_prefetch
        if self._mesh is None:
            return device_prefetch(iter(loader), depth=3)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(self._mesh, P("data"))

        def batches():
            for local in loader.sampler:
                yield loader.dataset.batch(self._pad_multiple(np.asarray(local)))

        return device_prefetch(batches(), depth=3, device=sharding)

    def _packed_eval_batches(self, loader: HostLoader, packed: int):
        """Fixed-size eval batches ACROSS scan boundaries (Trainer.packed_eval):
        concatenate every scan's slices in scan order, chop into chunks of
        `packed` global indices (-1 right-padding), and carry per-slice scan
        names for the host-side per-scan dice grouping. One scan per program
        (the reference's ScanBatchSampler geometry) leaves the 224^2 decoder
        stages lane-starved at B~12 AND dispatches n_scans programs per eval;
        packing runs ceil(total/packed) programs at a lane-friendlier batch.
        The per-scan 3D dice is IDENTICAL because grouping is by scan name,
        not by batch (SURVEY §7: per-scan dice via scan-id grouping with
        padding); only the logged eval `loss` weighting shifts from per-scan
        means to per-chunk means. device_data path only."""
        ds = loader.dataset
        scan2idx = ds.scan_to_indices()
        flats, names = [], []
        for s in sorted(scan2idx):
            idx = np.asarray(ds.to_global(scan2idx[s]), np.int32)
            flats.append(idx)
            names.extend([s] * len(idx))
        flat = np.concatenate(flats) if flats else np.zeros((0,), np.int32)
        step = max(int(packed), self.n_shards)
        for start in range(0, len(flat), step):
            chunk = flat[start:start + step]
            if len(chunk) < step:
                chunk = np.concatenate(
                    [chunk, np.full(step - len(chunk), -1, np.int32)])
            gidx = self._pad_multiple(chunk)
            chunk_names = names[start:start + step]
            yield gidx, chunk_names + [""] * (len(gidx) - len(chunk_names))

    def _run_eval_epoch(self, loader: HostLoader) -> (Dict, float):
        C = self._model.num_classes
        meters = MeterInterface(default_focus="eval")
        meters.register_meter("loss", AverageValueMeter())
        dice = meters.register_meter("dice", UniversalDice(C, report_axises=list(range(1, C))))
        sampler = loader.sampler
        from ..data.loader import device_prefetch
        pending = []
        packed = int((self._config.get("Trainer") or {}).get("packed_eval", 0))
        if self._device_data and packed > 0:
            for gidx, names in self._packed_eval_batches(loader, packed):
                out = self._eval_step(
                    self._state.params["model"], self._state.batch_stats,
                    self._put_batch(gidx))
                pending.append((out, (gidx >= 0).astype(np.float32), names))
        elif self._device_data:
            ds = loader.dataset
            for i, local in enumerate(sampler):
                gidx = self._pad_multiple(np.asarray(ds.to_global(local), np.int32))
                out = self._eval_step(
                    self._state.params["model"], self._state.batch_stats,
                    self._put_batch(gidx))
                pending.append((out, (gidx >= 0).astype(np.float32),
                                sampler.scan_of_batch(i)))
        else:
            for i, batch in enumerate(self._eval_batches(loader)):
                out = self._eval_step(
                    self._state.params["model"], self._state.batch_stats, batch)
                pending.append((out, batch["valid"], sampler.scan_of_batch(i)))
        # stack outputs on device, fetch once (one RPC per buffer otherwise)
        outs = [o for o, _, _ in pending]
        stacked = self._fetch(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *outs)) if outs else {}
        # `valid` comes back as a batch-sharded device array on the
        # host-streaming path (device_prefetch shards it across processes on
        # a multi-host mesh) — fetch through the same all_gather-first path
        # as the step outputs; the other branches carry host numpy (no-op).
        valids = self._fetch([v for _, v, _ in pending])
        for b, (_, _, scan) in enumerate(pending):
            out = jax.tree_util.tree_map(lambda x: x[b], stacked)
            meters["loss"].add(float(out["loss"]))
            keep = np.asarray(valids[b]).astype(bool)
            if not isinstance(scan, (str, type(None))):
                scan = [g for g, k in zip(scan, keep) if k]  # packed_eval path
            dice.add(out["inter"][keep], out["union"][keep], group_name=scan)
        stats = meters.statistics("eval")
        return stats, float(stats["dice"]["DSC_mean"])

    # ------------------------------------------------------- deferred (zero-read) loop
    def _dispatch_eval(self, loader: HostLoader):
        """Dispatch all eval batches; return (stacked_outs_dev, valids_np, scans).
        No device reads. Always per-scan batches: `Trainer.packed_eval` only
        applies to the eager eval loop (`_device_val_score`'s jitted
        best-checkpoint selection relies on batch == scan; the deferred run
        already pays zero per-program dispatch reads, so packing buys little
        there)."""
        sampler = loader.sampler
        ds = loader.dataset
        outs, valids, scans = [], [], []
        for i, local in enumerate(sampler):
            gidx = self._pad_multiple(np.asarray(ds.to_global(local), np.int32))
            outs.append(self._eval_step(
                self._state.params["model"], self._state.batch_stats,
                self._put_batch(gidx)))
            valids.append((gidx >= 0).astype(np.float32))
            scans.append(sampler.scan_of_batch(i))
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
        return stacked, np.stack(valids), scans

    @staticmethod
    @jax.jit
    def _device_val_score(inter, union):
        """Grouped-eval DSC_mean on device: [n_scans, B, C] sums -> scalar.
        Matches UniversalDice exactly when each eval batch is one scan."""
        inter_scan = jnp.sum(inter, axis=1)
        union_scan = jnp.sum(union, axis=1)
        dsc = (2.0 * inter_scan + 1e-6) / (union_scan + 1e-6)
        return jnp.mean(dsc[:, 1:])

    @staticmethod
    @jax.jit
    def _update_best(best_score, best_params, best_stats, score, params, stats):
        better = score > best_score
        pick = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
            lambda a, b: jnp.where(better, a, b), new, old)
        return (jnp.where(better, score, best_score),
                pick(params, best_params), pick(stats, best_stats))

    def _start_training_deferred(self) -> float:
        assert self._device_data, "defer_reads requires device-resident data"
        assert hasattr(self._train_step, "epoch_step"), "defer_reads needs epoch-batched steps"
        records = []
        best_score = jnp.asarray(-jnp.inf, jnp.float32)
        # copies: the live state's buffers get donated by the first train step
        best_params = jax.tree_util.tree_map(jnp.copy, self._state.params["model"])
        best_stats = jax.tree_util.tree_map(jnp.copy, self._state.batch_stats)
        start = self._cur_epoch + 1 if self._cur_epoch else 1
        # flush_every: periodic durability for deferred runs — every N epochs,
        # drain the live state once and write last.ckpt so a killed run
        # resumes from the last flush instead of losing everything (the
        # reference is durable every epoch, contrastyou/trainer/base.py:106-113;
        # the default 0 keeps the zero-read fast path).
        flush_every = int((self._config.get("Trainer") or {}).get("flush_every", 0))
        t_run = time.time()
        for self._cur_epoch in range(start, self._max_epoch + 1):
            scalars = self._hook_scalars()
            host_mats, dev_args = self._epoch_matrices(scalars)
            t0 = time.time()
            pending = []
            for b in range(self._num_batches):
                self._state, metrics = self._train_step.epoch_step(self._state, *dev_args)
                pending.append(metrics)
            train_stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pending)
            # bound the dispatch queue at one epoch (a wait, not a read)
            jax.block_until_ready(self._state)
            val_out, val_valid, val_scans = self._dispatch_eval(self._val_loader)
            score = self._device_val_score(val_out["inter"], val_out["union"])
            test_rec = (self._dispatch_eval(self._test_loader)
                        if self._test_loader is not None else None)
            best_score, best_params, best_stats = self._update_best(
                best_score, best_params, best_stats, score,
                self._state.params["model"], self._state.batch_stats)
            records.append(dict(epoch=self._cur_epoch, train=train_stacked,
                                tokens=host_mats[0], val=(val_out, val_valid, val_scans),
                                test=test_rec, score=score, elapsed=time.time() - t0,
                                lr=self._host_lr()))
            for h in self._hooks:
                h.on_epoch_end()
            if flush_every and self._cur_epoch % flush_every == 0 \
                    and self._cur_epoch < self._max_epoch:
                self._save_state("last.ckpt", jax.device_get(self._state),
                                 self._host_meta())
        jax.block_until_ready(self._state)
        if not records:
            # resumed at/after max_epoch: nothing trained, nothing to drain —
            # keep the restored best score and still write a durable last.ckpt
            final_host = jax.device_get(self._state)
            self._save_state("last.ckpt", final_host, self._host_meta())
            self._mark_success()
            return self._best_score
        logger.info("deferred run: %d epochs dispatched+executed in %.1fs; draining",
                    self._max_epoch - start + 1, time.time() - t_run)

        # ---- ONE drain of everything, then reconstruct per-epoch observability.
        # Stack across epochs ON DEVICE first: the device link charges a full
        # round trip per fetched buffer, so we fetch a handful of big arrays
        # instead of hundreds of small ones.
        def stack_epochs(trees):
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

        all_train = stack_epochs([r["train"] for r in records])
        all_val = stack_epochs([r["val"][0] for r in records])
        all_test = (stack_epochs([r["test"][0] for r in records])
                    if records[0]["test"] is not None else None)
        all_scores = jnp.stack([r["score"] for r in records])
        all_train, all_val, all_test, all_scores, best_params, best_stats, best_score = \
            self._fetch((all_train, all_val, all_test, all_scores,
                            best_params, best_stats, best_score))
        fetched = [
            (jax.tree_util.tree_map(lambda x: x[e], all_train),
             jax.tree_util.tree_map(lambda x: x[e], all_val),
             (jax.tree_util.tree_map(lambda x: x[e], all_test)
              if all_test is not None else None),
             all_scores[e])
            for e in range(len(records))]
        for r, (train_stacked, val_out, test_out, score) in zip(records, fetched):
            meters = MeterInterface(default_focus=self.train_meter_focus)
            with meters.focus_on(self.train_meter_focus):
                self._configure_train_meters(meters)
            nb = train_stacked["sup_loss"].shape[0] if "sup_loss" in train_stacked else \
                train_stacked["reg_loss"].shape[0]
            for b in range(nb):
                m = jax.tree_util.tree_map(lambda x: x[b], train_stacked)
                groups, valid = self._groups_and_valid(r["tokens"][b])
                self._consume_train_metrics(meters, m, groups, {"valid": valid})
            with meters.focus_on(self.train_meter_focus):
                meters["lr"].add(r["lr"])
            train_stats = meters.statistics()
            train_stats.setdefault(self.train_meter_focus, {})["throughput"] = {
                "slices_per_sec": self._epoch_slices() / max(r["elapsed"], 1e-9)}
            val_stats = self._eval_stats_from_stacked(val_out, r["val"][1], r["val"][2])
            test_stats = (self._eval_stats_from_stacked(test_out, r["test"][1], r["test"][2])
                          if test_out is not None else {})
            self._storage.put_epoch(r["epoch"], {**train_stats, "val": val_stats,
                                                 "test": test_stats})
            self._writer.add_scalars_from_meter_interface(
                r["epoch"], **train_stats, val=val_stats, test=test_stats)
            logger.info("epoch %03d | val DSC %.4f | %s", r["epoch"], float(score),
                        meter_display(train_stats))
        self._storage.flush()
        self._writer.flush()
        self._best_score = float(best_score)
        # best.ckpt: best weights/stats with the final optimizer state (deferred
        # mode trades per-epoch durability for zero-sync training)
        final_host = jax.device_get(self._state)
        best_state = final_host.replace(
            params={**final_host.params, "model": best_params}, batch_stats=best_stats)
        meta = self._host_meta()
        self._save_state("best.ckpt", best_state, meta)
        self._save_state("last.ckpt", final_host, meta)
        logger.info("deferred run done | best val DSC %.4f", self._best_score)
        self._mark_success()
        return self._best_score

    def _eval_stats_from_stacked(self, out, valids, scans) -> Dict:
        C = self._model.num_classes
        meters = MeterInterface(default_focus="eval")
        meters.register_meter("loss", AverageValueMeter())
        dice = meters.register_meter("dice", UniversalDice(C, report_axises=list(range(1, C))))
        for b, scan in enumerate(scans):
            keep = np.asarray(valids[b]).astype(bool)
            meters["loss"].add(float(out["loss"][b]))
            dice.add(out["inter"][b][keep], out["union"][b][keep], group_name=scan)
        return meters.statistics("eval")

    # ----------------------------------------------------------------- main loop
    def start_training(self) -> float:
        if not self.__initialized__:
            raise RuntimeError("call init() first")
        if self._defer_reads:
            return self._start_training_deferred()
        start = self._cur_epoch + 1 if self._cur_epoch else 1
        profile_dir = (self._config.get("Trainer") or {}).get("profile_dir")
        for self._cur_epoch in range(start, self._max_epoch + 1):
            if profile_dir and self._cur_epoch == start + 1:
                # trace the second epoch (first is compile-heavy)
                with jax.profiler.trace(str(profile_dir)):
                    train_stats = self._run_train_epoch()
                # host wall-clock is ack-based on relayed backends; the
                # device plane is ground truth (utils/profiling.py)
                from ..utils.profiling import device_ms_per_step
                dev_ms = device_ms_per_step(str(profile_dir))
                if dev_ms:
                    logger.info("profiled epoch: %.2f ms/step DEVICE time", dev_ms)
            else:
                train_stats = self._run_train_epoch()
            val_stats, cur_score = self._run_eval_epoch(self._val_loader)
            test_stats, _ = (self._run_eval_epoch(self._test_loader)
                             if self._test_loader is not None else ({}, 0.0))
            # one device->host fetch per epoch, shared by best + last writes
            # (the full state is ~100MB+ through the device link)
            is_best = cur_score > self._best_score
            if is_best:
                self._best_score = cur_score
            save_every = int((self._config.get("Trainer") or {}).get("save_every", 1))
            save_last = (self._cur_epoch % max(save_every, 1) == 0
                         or self._cur_epoch == self._max_epoch)
            if is_best or save_last:
                host_state = jax.device_get(self._state)
                meta = self._host_meta()
                if is_best:
                    self._save_state("best.ckpt", host_state, meta)
                if save_last:
                    self._save_state("last.ckpt", host_state, meta)
            self._storage.put_epoch(self._cur_epoch, {**train_stats,
                                                      "val": val_stats, "test": test_stats})
            self._storage.flush()
            self._writer.add_scalars_from_meter_interface(
                self._cur_epoch, **train_stats, val=val_stats, test=test_stats)
            for h in self._hooks:
                h.on_epoch_end()
            # mytqdm parity: one summary line per epoch with every meter
            # (reference contrastyou/mytqdm/mytqdm.py:55-57)
            logger.info("epoch %03d | val DSC %.4f (best %.4f) | %s",
                        self._cur_epoch, cur_score, self._best_score,
                        meter_display(train_stats))
        self._writer.flush()
        self._mark_success()
        return self._best_score

    # ----------------------------------------------------------------- io
    def _host_meta(self) -> Dict:
        return {"cur_epoch": self._cur_epoch, "best_score": float(self._best_score),
                "keychain": self._keychain.state_dict(),
                "storage": self._storage.state_dict(),
                "hooks": {h.name: h.state_dict() for h in self._hooks}}

    def save_to(self, save_name: str) -> None:
        if not self._is_master:
            return  # non-master processes never write checkpoints
        save_checkpoint(str(Path(self._save_dir) / save_name), self._state,
                        self._host_meta())

    def _save_state(self, name: str, state, meta) -> None:
        """Checkpoint an explicit (host) state — master only."""
        if self._is_master:
            save_checkpoint(str(Path(self._save_dir) / name), state, meta)

    def _mark_success(self) -> None:
        """Drop the .success marker (failure detection) — master only."""
        if self._is_master:
            from .. import success
            success(self._save_dir)

    def resume_from_path(self, path: str) -> None:
        assert self.__initialized__, "init() before resume"
        self._state, meta = load_checkpoint(path, self._state)
        if self._mesh is not None:
            # from_bytes leaves host numpy in the tree: restore replication
            self._state = self._put_replicated(self._state)
        self._cur_epoch = int(meta.get("cur_epoch", 0))
        self._best_score = float(meta.get("best_score", -np.inf))
        if "keychain" in meta:
            self._keychain.load_state_dict(meta["keychain"])
        if "storage" in meta:
            self._storage.load_state_dict(meta["storage"])
        for h in self._hooks:
            if h.name in meta.get("hooks", {}):
                h.load_state_dict(meta["hooks"][h.name])
        logger.info("resumed from %s at epoch %d", path, self._cur_epoch)

    @property
    def save_dir(self) -> str:
        return self._save_dir

    @property
    def state(self) -> TrainState:
        return self._state

    @property
    def best_score(self) -> float:
        return float(self._best_score)


class SemiTrainer(Trainer):
    """reference new_trainer.py:17-56."""


class FineTuneTrainer(Trainer):
    """Labeled-only (reference new_trainer.py:59-76, activate_hooks=False)."""
    activate_hooks = False
    uses_unlabeled = False

    def _build_steps(self) -> None:
        num_classes = self._model.num_classes
        self._train_step = self._cached_step("ft", lambda: build_finetune_step(
            self._model, self._optimizer, num_classes=num_classes,
            policy=self.train_policy, grad_mask=self._grad_mask, hooks=[],
            store=self._train_store()))
        self._eval_step = self._cached_step("eval", lambda: build_eval_step(
            self._model, num_classes=num_classes, crop=self._crop,
            store=self._eval_store(), val_policy=self.val_policy,
            out_size=self._eval_out_size()))

    def _train_dispatch(self, batch_l, unl_iter, key, scalars):
        return self._train_step(self._state, self._dispatch_batch(batch_l),
                                key, scalars)

    # stream/index/group plumbing is inherited from Trainer: with
    # uses_unlabeled=False it naturally degrades to the labeled-only shapes

    def _epoch_slices(self) -> int:
        per = getattr(self._labeled_loader.sampler, "_batch_size", 0)
        return per * self._num_batches


class MixUpTrainer(FineTuneTrainer):
    """Labeled-only + MixUp hook (reference new_trainer.py MixUpTrainer +
    MixUpEpocher, new_comparable.py:18-86)."""
    activate_hooks = True

    def _build_steps(self) -> None:
        num_classes = self._model.num_classes
        self._train_step = self._cached_step("ft_hooks", lambda: build_finetune_step(
            self._model, self._optimizer, num_classes=num_classes,
            policy=self.train_policy, grad_mask=self._grad_mask, hooks=self._hooks,
            store=self._train_store()))
        self._eval_step = self._cached_step("eval", lambda: build_eval_step(
            self._model, num_classes=num_classes, crop=self._crop,
            store=self._eval_store(), val_policy=self.val_policy,
            out_size=self._eval_out_size()))


class AdversarialTrainer(Trainer):
    """reference new_trainer.py AdversarialTrainer + AdversarialEpocher."""

    def __init__(self, *, reg_weight: float = 0.01, dis_consider_image: bool = False,
                 discr_lr: float = 1e-4, **kwargs):
        kwargs["defer_reads"] = False  # two-optimizer loop has no epoch-batched step
        super().__init__(**kwargs)
        self._reg_weight = float(reg_weight)
        self._dis_consider_image = bool(dis_consider_image)
        self._discr_lr = float(discr_lr)

    def _create_state(self, model_params, batch_stats, hook_params, needs_teacher):
        import optax
        self._discr = Discriminator(base_channels=64)
        in_ch = self._model.num_classes + (1 if self._dis_consider_image else 0)
        sample = jnp.zeros((2, self._crop, self._crop, in_ch), jnp.float32)
        discr_params = self._discr.init(self._keychain.next(), sample)
        self._discr_optimizer = optax.adam(self._discr_lr, b1=0.5, b2=0.999)
        return create_train_state(model_params=model_params, batch_stats=batch_stats,
                                  hook_params=hook_params, tx=self._optimizer,
                                  teacher=needs_teacher, discr_params=discr_params,
                                  discr_tx=self._discr_optimizer)

    def _build_steps(self) -> None:
        num_classes = self._model.num_classes
        self._train_step = self._mh_wrap_step(build_adversarial_step(
            self._model, self._discr, self._optimizer, self._discr_optimizer,
            num_classes=num_classes, policy=self.train_policy,
            reg_weight=self._reg_weight, dis_consider_image=self._dis_consider_image,
            store=self._train_store()), "adv")
        self._eval_step = self._mh_wrap_step(
            build_eval_step(self._model, num_classes=num_classes,
                            crop=self._crop, store=self._eval_store(),
                            val_policy=self.val_policy,
                            out_size=self._eval_out_size()), "adv_eval")

    def _configure_train_meters(self, meters: MeterInterface) -> None:
        super()._configure_train_meters(meters)
        with meters.focus_on("adv_reg"):
            meters.register_meter("gen_loss", AverageValueMeter())
            meters.register_meter("dis_loss", AverageValueMeter())

    def _train_dispatch(self, batch_l, unl_iter, key, scalars):
        batch_u = next(unl_iter)
        return self._train_step(self._state, self._dispatch_batch(batch_l),
                                self._dispatch_batch(batch_u), key)

    def _consume_train_metrics(self, meters, metrics, groups, batch_l) -> None:
        m = self._fetch(metrics)
        with meters.focus_on(self.train_meter_focus):
            meters["sup_loss"].add(float(m["sup_loss"]))
            keep = np.asarray(batch_l["valid"]).astype(bool)
            meters["sup_dice"].add(m["inter"][keep], m["union"][keep],
                                   group_name=[g for g, k in zip(groups, keep) if k])
        with meters.focus_on("adv_reg"):
            meters["gen_loss"].add(float(m["gen_loss"]))
            meters["dis_loss"].add(float(m["dis_loss"]))


class _PretrainTrainer(Trainer):
    """Contrastive pretraining (reference new_pretrain.py:18-110): the data
    stream is the contrastive loader; loss = hook regularizers only; no eval;
    `last.ckpt` saved every epoch."""
    total_freedom = True  # encoder pretrain; decoder pretrain overrides
    policy_kind = "pretrain"  # strong two-view transforms (creator.py:25-33)

    def __init__(self, *, contrastive_loader: HostLoader, forward_until: Optional[str] = None,
                 **kwargs):
        super().__init__(**kwargs)
        self._contrastive_loader = contrastive_loader
        self._forward_until = forward_until
        self._init_until = forward_until  # param tree stops here (see Trainer.init)

    def _train_store(self):
        if not self._device_data:
            return None
        return DeviceStore.for_dataset(self._contrastive_loader.dataset,
                                       mesh=self._mesh)

    def _build_steps(self) -> None:
        grad_cache = int((self._config.get("Trainer") or {}).get("grad_cache", 0))
        if grad_cache:
            # chunked two-pass gradients: encoder activation memory O(chunk)
            # instead of O(2N) — the large-global-batch pretrain path
            # (training/gradcache.py; Gao et al. 2021)
            from .gradcache import build_gradcache_pretrain_step
            self._train_step = self._mh_wrap_step(build_gradcache_pretrain_step(
                self._model, self._hooks, self._optimizer, policy=self.train_policy,
                total_freedom=self.total_freedom, until=self._forward_until,
                num_chunks=grad_cache, grad_mask=self._grad_mask,
                store=self._train_store(), mesh=self._mesh), "pre_gc")
        else:
            self._train_step = self._mh_wrap_step(build_pretrain_step(
                self._model, self._hooks, self._optimizer, policy=self.train_policy,
                total_freedom=self.total_freedom, until=self._forward_until,
                grad_mask=self._grad_mask, store=self._train_store(),
                mesh=self._mesh), "pre")
        # batch-0 sim/pos/sp-mask TensorBoard dumps (reference
        # semi_seg/hooks/infonce.py:185-193,263-266). Opt-in: the probe is one
        # extra XLA program, and compiles are minutes on this relay.
        self._matrix_probe = None
        if grad_cache and (self._config.get("Trainer") or {}).get("dump_matrices"):
            # the probe derives whole-batch augmentation keys (the gradcache
            # step folds keys per chunk — its geometry would not match) and
            # materializes [2N,2N] matrices, reintroducing the memory wall
            # grad_cache exists to remove
            raise ValueError("Trainer.dump_matrices is incompatible with "
                             "Trainer.grad_cache — disable one")
        if (self._config.get("Trainer") or {}).get("dump_matrices") and self._device_data:
            from .steps import build_matrix_probe
            self._matrix_probe = build_matrix_probe(
                self._model, self._hooks, policy=self.train_policy,
                total_freedom=self.total_freedom, until=self._forward_until,
                store=self._train_store())
        self._eval_step = self._mh_wrap_step(
            build_eval_step(self._model, num_classes=self._model.num_classes,
                            crop=self._crop, store=self._eval_store(),
                            val_policy=self.val_policy,
                            out_size=self._eval_out_size()), "pre_eval")

    def _run_train_epoch(self) -> Dict:
        meters = MeterInterface(default_focus=self.train_meter_focus)
        with meters.focus_on(self.train_meter_focus):
            meters.register_meter("lr", AverageValueMeter())
            meters.register_meter("reg_loss", AverageValueMeter())
        scalars = self._hook_scalars()
        from itertools import islice
        from ..data.loader import device_prefetch
        t0 = time.time()
        n_slices = 0
        pending = []  # drain once at epoch end (no per-step host sync)
        dumped_matrices = None
        if self._device_data:
            mat = self._index_matrix(self._contrastive_loader)
            dev_mat, dev_scalars = (self._put_batch(mat, 2),
                                    self._put_replicated(scalars))
            if getattr(self, "_matrix_probe", None) is not None:
                # batch 0 of this epoch: same index row + step key as the step
                key0 = jax.random.fold_in(
                    self._state.base_key, (self._cur_epoch - 1) * self._num_batches)
                dumped_matrices = self._matrix_probe(
                    self._state.params, self._state.batch_stats,
                    self._put_batch(np.asarray(mat[0])), key0, scalars)
            # throughput counts REAL slices: both the contrast sampler and
            # mesh rounding pad with -1 (valid=0) entries
            valid_per_batch = 2 * int((mat >= 0).sum()) // max(mat.shape[0], 1)
            t0 = time.time()
            last = [t0]
            for b in range(self._num_batches):
                n_slices += valid_per_batch
                self._state, metrics = self._train_step.epoch_step(
                    self._state, dev_mat, dev_scalars)
                pending.append(metrics)
                self._progress(b, t0, last, valid_per_batch)
        else:
            it = device_prefetch(
                islice(iter(self._contrastive_loader), self._num_batches), depth=3)
            t0 = time.time()
            last = [t0]
            for b in range(self._num_batches):
                batch = next(it)
                n_slices += 2 * batch["image"].shape[0]
                key = self._keychain.next()
                self._state, metrics = self._train_step(self._state, batch, key, scalars)
                pending.append(metrics)
                self._progress(b, t0, last, 2 * batch["image"].shape[0])
        jax.block_until_ready(self._state)
        elapsed = time.time() - t0
        stacked = jax.device_get(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *pending))
        for b in range(len(pending)):
            m = jax.tree_util.tree_map(lambda x: x[b], stacked)
            # fail fast on NaN like the reference criterion (contrast_loss3.py:108)
            if not np.isfinite(m["reg_loss"]):
                raise RuntimeError(f"non-finite pretrain reg_loss at batch {b}: "
                                   f"{m['reg_loss']}")
            with meters.focus_on(self.train_meter_focus):
                meters["reg_loss"].add(float(m["reg_loss"]))
            for name, hm in m.get("hooks", {}).items():
                with meters.focus_on(name):
                    for k, v in hm.items():
                        if k not in meters:
                            meters.register_meter(k, AverageValueMeter())
                        meters[k].add(float(v))
        with meters.focus_on(self.train_meter_focus):
            meters["lr"].add(self._host_lr())
        if dumped_matrices is not None:
            for hname, mats in self._fetch(dumped_matrices).items():
                for mname, m in mats.items():
                    self._writer.add_matrix_image(f"{hname}/{mname}", m, self._cur_epoch)
        stats = meters.statistics()
        stats.setdefault(self.train_meter_focus, {})["throughput"] = {
            "slices_per_sec": n_slices / max(elapsed, 1e-9)}
        return stats

    def start_training(self) -> float:
        if not self.__initialized__:
            raise RuntimeError("call init() first")
        if self._defer_reads:
            return self._start_pretrain_deferred()
        start = self._cur_epoch + 1 if self._cur_epoch else 1
        for self._cur_epoch in range(start, self._max_epoch + 1):
            train_stats = self._run_train_epoch()
            save_every = int((self._config.get("Trainer") or {}).get("save_every", 1))
            if (self._cur_epoch % max(save_every, 1) == 0
                    or self._cur_epoch == self._max_epoch):
                self.save_to("last.ckpt")
            self._storage.put_epoch(self._cur_epoch, train_stats)
            self._storage.flush()
            for h in self._hooks:
                h.on_epoch_end()
            logger.info("pretrain epoch %03d | %s", self._cur_epoch,
                        meter_display(train_stats))
        self._mark_success()
        return 0.0

    def _start_pretrain_deferred(self) -> float:
        """Zero-read pretraining: no eval, metrics drained once at the end."""
        assert self._device_data and hasattr(self._train_step, "epoch_step")
        records = []
        start = self._cur_epoch + 1 if self._cur_epoch else 1
        flush_every = int((self._config.get("Trainer") or {}).get("flush_every", 0))
        t_run = time.time()
        for self._cur_epoch in range(start, self._max_epoch + 1):
            scalars = self._hook_scalars()
            mat = self._index_matrix(self._contrastive_loader)
            dev_mat, dev_scalars = (self._put_batch(mat, 2),
                                    self._put_replicated(scalars))
            t0 = time.time()
            pending = []
            for b in range(self._num_batches):
                self._state, metrics = self._train_step.epoch_step(
                    self._state, dev_mat, dev_scalars)
                pending.append(metrics)
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pending)
            # bound the dispatch queue at one epoch (a wait, not a read)
            jax.block_until_ready(self._state)
            records.append(dict(epoch=self._cur_epoch, train=stacked,
                                n_slices=2 * int((mat >= 0).sum())
                                * self._num_batches // max(mat.shape[0], 1),
                                elapsed=time.time() - t0,
                                lr=self._host_lr()))
            for h in self._hooks:
                h.on_epoch_end()
            if flush_every and self._cur_epoch % flush_every == 0 \
                    and self._cur_epoch < self._max_epoch:
                self.save_to("last.ckpt")
        jax.block_until_ready(self._state)
        logger.info("deferred pretrain: %d epochs in %.1fs; draining",
                    self._max_epoch - start + 1, time.time() - t_run)
        all_train = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[r["train"] for r in records])
        all_train = self._fetch(all_train)
        fetched = [jax.tree_util.tree_map(lambda x: x[e], all_train)
                   for e in range(len(records))]
        for r, stacked in zip(records, fetched):
            meters = MeterInterface(default_focus=self.train_meter_focus)
            with meters.focus_on(self.train_meter_focus):
                meters.register_meter("lr", AverageValueMeter())
                meters.register_meter("reg_loss", AverageValueMeter())
            nb = stacked["reg_loss"].shape[0]
            for b in range(nb):
                with meters.focus_on(self.train_meter_focus):
                    meters["reg_loss"].add(float(stacked["reg_loss"][b]))
                for name, hm in stacked.get("hooks", {}).items():
                    with meters.focus_on(name):
                        for k, v in hm.items():
                            if k not in meters:
                                meters.register_meter(k, AverageValueMeter())
                            meters[k].add(float(v[b]))
            with meters.focus_on(self.train_meter_focus):
                meters["lr"].add(r["lr"])
            stats = meters.statistics()
            stats.setdefault(self.train_meter_focus, {})["throughput"] = {
                "slices_per_sec": r["n_slices"] / max(r["elapsed"], 1e-9)}
            self._storage.put_epoch(r["epoch"], stats)
            logger.info("pretrain epoch %03d | %s", r["epoch"], meter_display(stats))
        self._storage.flush()
        self.save_to("last.ckpt")
        self._mark_success()
        return 0.0


class PretrainEncoderTrainer(_PretrainTrainer):
    total_freedom = True


class PretrainDecoderTrainer(_PretrainTrainer):
    """Decoder pretrain: the two views share geometry (reference asserts
    total_freedom=False, new_pretrain.py:104-110) so dense positions align."""
    total_freedom = False


trainer_zoo = {
    "semi": SemiTrainer,
    "ft": FineTuneTrainer,
    "finetune": FineTuneTrainer,
    "mixup": MixUpTrainer,
    "adv": AdversarialTrainer,
    "pretrain": PretrainEncoderTrainer,
    "pretrain_encoder": PretrainEncoderTrainer,
    "pretrain_decoder": PretrainDecoderTrainer,
}
