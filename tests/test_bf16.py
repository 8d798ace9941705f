"""bfloat16 compute-path coverage (Arch.dtype=bfloat16)."""
import jax
import jax.numpy as jnp
import numpy as np

from spcl_tpu.entry.common import build_model_from_config
from spcl_tpu.models import UNet


def test_build_model_dtype_config():
    m = build_model_from_config({"Arch": {"dtype": "bfloat16", "max_channel": 128}})
    assert m.dtype == jnp.bfloat16


def test_bf16_unet_forward_and_grad():
    model = UNet(input_dim=1, num_classes=4, max_channel=128, dtype=jnp.bfloat16)
    x = jnp.zeros((2, 32, 32, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    # params stay f32, logits come back f32
    assert v["params"]["Conv1"]["conv0"]["kernel"].dtype == jnp.float32
    acts = model.apply(v, x, train=False)
    assert acts["logits"].dtype == jnp.float32

    def loss(p):
        a, _ = model.apply({"params": p, "batch_stats": v["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        return jnp.mean(a["logits"] ** 2)

    g = jax.grad(loss)(v["params"])
    leaf = np.asarray(g["Conv1"]["conv0"]["kernel"])
    assert leaf.dtype == np.float32 and np.isfinite(leaf).all()
