#!/usr/bin/env python
"""Device-plane throughput of the serving artifact vs the in-framework eval.

Exports the flagship UNet-256 at the production packed-eval geometry
(batch 96, 224²) to a serving artifact (spcl_tpu/serving.py), reloads it,
and measures the served program's device ms/call against a direct jitted
apply of the same forward — the serving path should cost exactly what the
framework's own eval costs (same XLA program modulo export round-trip).

Run SOLO on the real TPU:
    python scripts/measure_serving.py [batch=96] [size=224]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from spcl_tpu.models import UNet
    from spcl_tpu.serving import export_inference, load_artifact, save_artifact
    from spcl_tpu.utils.profiling import profile_device_time

    assert jax.default_backend() == "tpu", jax.default_backend()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 224

    model = UNet(input_dim=1, num_classes=4, max_channel=256,
                 dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, size, size, 1), jnp.float32),
                           train=False)

    out = "/tmp/spcl_serving_bench.spclx"
    # pinned batch: the production serving shape (a symbolic-batch artifact
    # compiles the same program per concrete size on first use)
    exported = export_inference(model, variables, height=size, width=size,
                                batch_size=batch, platforms=("tpu",))
    save_artifact(out, exported)
    served = load_artifact(out)
    print(f"artifact: {Path(out).stat().st_size / 1e6:.1f} MB", flush=True)

    x = jnp.asarray(np.random.default_rng(0).random(
        (batch, size, size, 1), dtype=np.float32))

    direct = jax.jit(lambda v, img: (
        lambda lg: {"logits": lg,
                    "pred": jnp.argmax(lg, axis=-1).astype(jnp.int32)}
    )(model.apply(v, img, train=False)["logits"]))

    # compile + settle both programs before tracing
    jax.block_until_ready(served(x))
    jax.block_until_ready(direct(variables, x))

    served_ms = profile_device_time(lambda: served(x), reps=20)
    direct_ms = profile_device_time(lambda: direct(variables, x), reps=20)

    res = {
        "batch": batch, "size": size,
        "served_ms_per_call": served_ms,
        "direct_ms_per_call": direct_ms,
        "served_ms_per_slice": served_ms / batch if served_ms else None,
        "direct_ms_per_slice": direct_ms / batch if direct_ms else None,
        "overhead_pct": (100.0 * (served_ms - direct_ms) / direct_ms
                         if served_ms and direct_ms else None),
    }
    print(json.dumps(res, indent=2))
    art = Path(__file__).resolve().parents[1] / "tmp" / "serving_bench.json"
    art.parent.mkdir(exist_ok=True)
    art.write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
