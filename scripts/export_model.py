#!/usr/bin/env python
"""Export a checkpoint into a portable serving artifact (spcl_tpu/serving.py).

The artifact is serialized StableHLO with the weights baked in: the serving
host runs it with jax alone — no spcl_tpu, flax, or model source. Batch dim
is symbolic by default (one artifact, any request size); lowered for cpu+tpu.

Usage:
    python scripts/export_model.py runs/sp/pre/last.ckpt model.spclx
    python scripts/export_model.py last.ckpt m.spclx --size 224 \\
        --config Arch.max_channel=128 --batch 16 --platforms tpu

`--config` takes the repo's dotted-CLI grammar (Arch.num_classes=4 ...) and
is merged over config/base.yaml, so the model is built exactly the way the
training entry points build it (entry/common.py::build_model_from_config).
Verification: the artifact is reloaded and (unless --no-verify) its logits
are checked against a direct flax apply on random input.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="trainer ckpt / warm start / torch import")
    ap.add_argument("out", help="output artifact path (.spclx)")
    ap.add_argument("--size", type=int, default=224,
                    help="input H=W after the host-side val crop (default 224)")
    ap.add_argument("--batch", type=int, default=0,
                    help="pin the batch dim (0 = symbolic, default)")
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering platforms")
    ap.add_argument("--config", nargs="*", default=[],
                    help="dotted config overrides (Arch.max_channel=128 ...)")
    ap.add_argument("--no-verify", action="store_true")
    args = ap.parse_args(argv)

    from spcl_tpu import CONFIG_PATH
    from spcl_tpu.configure import ConfigManager
    from spcl_tpu.serving import export_from_checkpoint, load_artifact

    cm = ConfigManager(str(Path(CONFIG_PATH) / "base.yaml"),
                       strict=False).parse_args(list(args.config))
    meta = export_from_checkpoint(
        args.checkpoint, args.out, config=cm.merged_config,
        height=args.size, width=args.size,
        batch_size=args.batch or None,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()))
    size = Path(args.out).stat().st_size
    print(f"wrote {args.out}: {size / 1e6:.1f} MB, "
          f"input {meta['input_shape']} {meta['input_dtype']}, "
          f"platforms {meta['platforms']}")

    if not args.no_verify:
        import numpy as np
        import jax
        import jax.numpy as jnp
        from spcl_tpu.entry.common import build_model_from_config
        from spcl_tpu.training.checkpoint import load_model_params

        live = jax.default_backend()
        if live not in meta["platforms"]:
            print(f"skipping verification: artifact lowered for "
                  f"{meta['platforms']}, this host's backend is {live!r} "
                  f"(re-run with --platforms {live} included to verify here)")
            return
        served = load_artifact(args.out)
        b = args.batch or 2
        x = np.random.default_rng(0).random(
            (b, args.size, args.size, 1), dtype=np.float32)
        out = served(x)
        model = build_model_from_config(cm.merged_config)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, args.size, args.size,
                                          model.input_dim), jnp.float32),
                               train=False)
        params, stats = load_model_params(
            args.checkpoint, {"params": variables["params"],
                              "batch_stats": variables.get("batch_stats", {})})
        ref = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=False)["logits"]
        err = float(np.abs(np.asarray(out["logits"]) - np.asarray(ref)).max())
        assert err < 1e-4, f"artifact logits drift {err} vs direct apply"
        print(f"verified: served logits match direct apply (max abs {err:.2e})")


if __name__ == "__main__":
    main()
