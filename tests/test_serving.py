"""Serving export (spcl_tpu/serving.py): artifact round-trip, batch
polymorphism, and the checkpoint -> artifact CLI."""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spcl_tpu.models import UNet
from spcl_tpu.serving import (export_inference, load_artifact, save_artifact)

SIZE = 48


def _model_and_vars(max_channel=128, num_classes=4):
    model = UNet(input_dim=1, num_classes=num_classes, max_channel=max_channel)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, SIZE, SIZE, 1), jnp.float32),
                           train=False)
    return model, variables


def test_artifact_roundtrip_polymorphic_batch(tmp_path):
    model, variables = _model_and_vars()
    exported = export_inference(model, variables, height=SIZE, width=SIZE,
                                platforms=("cpu",))
    path = str(tmp_path / "m.spclx")
    meta = save_artifact(path, exported, extra_meta={"num_classes": 4})
    assert meta["input_shape"] == ["b", str(SIZE), str(SIZE), "1"]

    served = load_artifact(path)
    assert served.meta["num_classes"] == 4
    rng = np.random.default_rng(0)
    # two different batch sizes through ONE artifact (symbolic batch dim)
    for b in (3, 5):
        x = rng.random((b, SIZE, SIZE, 1), dtype=np.float32)
        out = served(x)
        ref = model.apply(variables, jnp.asarray(x), train=False)["logits"]
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.asarray(ref), atol=1e-5)
        assert np.array_equal(np.asarray(out["pred"]),
                              np.argmax(np.asarray(ref), axis=-1))


def test_pinned_batch_export(tmp_path):
    model, variables = _model_and_vars()
    exported = export_inference(model, variables, height=SIZE, width=SIZE,
                                batch_size=2, platforms=("cpu",))
    path = str(tmp_path / "m.spclx")
    save_artifact(path, exported)
    served = load_artifact(path)
    assert served.meta["input_shape"][0] == "2"
    x = np.zeros((2, SIZE, SIZE, 1), np.float32)
    assert served(x)["pred"].shape == (2, SIZE, SIZE)


def test_load_rejects_non_artifact(tmp_path):
    bad = tmp_path / "not.spclx"
    bad.write_bytes(b"garbage bytes")
    with pytest.raises(ValueError, match="not a spcl_tpu serving artifact"):
        load_artifact(str(bad))


@pytest.mark.slow
def test_export_cli_from_checkpoint(tmp_path):
    """checkpoint -> scripts/export_model.py -> artifact that matches a
    direct flax apply (the CLI's own --verify path asserts this too)."""
    from spcl_tpu.models.torch_import import write_warm_start

    model, variables = _model_and_vars()
    ckpt = str(tmp_path / "warm.ckpt")
    write_warm_start(ckpt, variables["params"], variables["batch_stats"])

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import export_model

    out = str(tmp_path / "m.spclx")
    export_model.main([ckpt, out, "--size", str(SIZE), "--platforms", "cpu",
                       "--config", "Arch.max_channel=128"])
    served = load_artifact(out)
    assert served.meta["checkpoint"] == ckpt
    assert served.meta["max_channel"] == 128
    x = np.random.default_rng(1).random((2, SIZE, SIZE, 1), dtype=np.float32)
    ref = model.apply(variables, jnp.asarray(x), train=False)["logits"]
    np.testing.assert_allclose(np.asarray(served(x)["logits"]),
                               np.asarray(ref), atol=1e-5)
