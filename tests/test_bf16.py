"""bfloat16 compute-path coverage (Arch.dtype=bfloat16)."""
import jax
import jax.numpy as jnp
import numpy as np

from spcl_tpu.entry.common import build_model_from_config
from spcl_tpu.models import UNet
import pytest

pytestmark = pytest.mark.slow  # multi-epoch integration (see pyproject)


def test_build_model_dtype_config():
    m = build_model_from_config({"Arch": {"dtype": "bfloat16", "max_channel": 128}})
    assert m.dtype == jnp.bfloat16


def test_bf16_finetune_learns(tmp_path):
    """One real finetune epoch under Arch.dtype=bfloat16: trains, evals,
    checkpoints — the documented mixed-precision path end to end."""
    from spcl_tpu.data import get_data, synthetic_dataset
    from spcl_tpu.training import FineTuneTrainer

    tra = synthetic_dataset("acdc", num_scans=6, slices_per_scan=(6, 8), canvas=64, seed=0)
    test = synthetic_dataset("acdc", num_scans=3, canvas=64, seed=1, mode="val")
    lab, unlab, val, tst = get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                                    labeled_batch_size=3, unlabeled_batch_size=3,
                                    load_predefined_list=False)
    model = UNet(input_dim=1, num_classes=4, max_channel=128, dtype=jnp.bfloat16)
    tr = FineTuneTrainer(model=model, labeled_loader=lab, unlabeled_loader=unlab,
                         val_loader=val, test_loader=None, save_dir=str(tmp_path),
                         max_epoch=2, num_batches=3,
                         config={"Optim": {"name": "adam", "lr": 1e-3}},
                         crop=48, data_name="acdc")
    tr.init()
    score = tr.start_training()
    assert 0.0 <= score <= 1.0
    import pandas as pd
    df = pd.read_csv(tmp_path / "storage.csv")
    assert np.isfinite(df["tra/sup_loss/mean"]).all()
    # params stayed f32
    assert tr.state.params["model"]["Conv1"]["conv0"]["kernel"].dtype == jnp.float32


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
