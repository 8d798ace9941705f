#!/usr/bin/env python
"""Linear probe of the pretrained encoder's meta-label structure.

The paper's mechanism (contrast_loss3.py:113-222) is that self-paced
weighting keeps contrastive pretraining useful when meta-labels are noisy.
End-task dice is a blunt instrument for that (generic features already help);
this probe measures the mechanism directly: how linearly separable the CLEAN
anatomy level (partition) is in frozen Conv5 features after each pretrain.

For every runs/effect_study/<arm>_s<seed>/pre/last.ckpt: embed all training
slices (val-policy center crop, eval mode), fit a least-squares one-hot
linear classifier on half the scans, report held-out accuracy on the rest.
Output: one JSON line per run + a per-arm summary.
"""
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def embed_dataset(ckpt: str, canvas: int = 64, crop: int = 48):
    import jax
    import jax.numpy as jnp
    from spcl_tpu.data import synthetic_dataset_hard
    from spcl_tpu.models import UNet
    from spcl_tpu.training.checkpoint import load_model_params

    ds = synthetic_dataset_hard("acdc", num_scans=20, canvas=canvas, seed=0)
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    x0 = jnp.zeros((1, crop, crop, 1), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), x0, train=False, until="Conv5")
    params, stats = load_model_params(
        ckpt, {"params": template["params"],
               "batch_stats": template.get("batch_stats", {})})

    off = (canvas - crop) // 2
    imgs = ds.images[:, off:off + crop, off:off + crop].astype(np.float32) / 255.0
    feats = []
    for i in range(0, len(imgs), 64):
        acts = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(imgs[i:i + 64, :, :, None]),
                           train=False, until="Conv5")
        feats.append(np.asarray(acts["Conv5"].mean(axis=(1, 2))))
    return np.concatenate(feats), ds


def probe_accuracy(feats: np.ndarray, ds) -> float:
    """Least-squares one-hot linear probe, split by PATIENT (no leakage)."""
    y = ds.partitions
    pats = np.asarray(ds.patient_index)
    train = pats % 2 == 0
    x = (feats - feats[train].mean(0)) / (feats[train].std(0) + 1e-6)
    x = np.concatenate([x, np.ones((len(x), 1))], 1)
    onehot = np.eye(int(y.max()) + 1)[y]
    w, *_ = np.linalg.lstsq(x[train], onehot[train], rcond=None)
    pred = (x[~train] @ w).argmax(1)
    return float((pred == y[~train]).mean())


def main():
    out_dir = ROOT / "runs" / "effect_study"
    rows = {}
    for ckpt in sorted(out_dir.glob("*_s*/pre/last.ckpt")):
        run = ckpt.parent.parent.name          # e.g. sp_corrupt_s20
        arm, seed = run.rsplit("_s", 1)
        feats, ds = embed_dataset(str(ckpt))
        acc = probe_accuracy(feats, ds)
        print(json.dumps({"arm": arm, "seed": int(seed),
                          "z_probe_acc": round(acc, 4)}), flush=True)
        rows.setdefault(arm, []).append(acc)
    summary = {a: {"mean": round(float(np.mean(v)), 4),
                   "std": round(float(np.std(v)), 4), "n": len(v)}
               for a, v in rows.items()}
    print(json.dumps({"summary": summary}))
    (out_dir / "z_probe.json").write_text(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
