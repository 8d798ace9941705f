"""Inference + weight-inspection entry points on synthetic data."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # step-compile/integration heavy (see pyproject)


TINY = [
    "Data.synthetic=true", "Data.canvas=64", "Data.crop=48",
    "Data.synthetic_scans=8", "Data.synthetic_test_scans=4",
    "Arch.max_channel=128", "Trainer.max_epoch=1", "Trainer.num_batches=2",
    "Optim.lr=1e-4", "Scheduler.multiplier=10", "Scheduler.warmup_max=1",
    "LabeledLoader.batch_size=3", "UnlabeledLoader.batch_size=3",
    "Data.labeled_scan_num=2",
]


def test_inference_entry(tmp_path):
    # train one tiny checkpoint, then run inference on it
    import main as train_entry
    train_entry.main(TINY + ["Trainer.name=ft", f"Trainer.save_dir={tmp_path}/tr"])
    import inference as entry
    report = entry.main(TINY + [
        f"Arch.checkpoint={tmp_path}/tr/last.ckpt",
        f"Trainer.save_dir={tmp_path}/inf",
    ])
    assert "DSC_mean" in report
    assert any(k.startswith("HD95") for k in report)
    assert any(k.startswith("ASSD") for k in report)


def test_weight_inspection_entry(tmp_path):
    import weight_inspection as entry
    out = entry.main(TINY + [
        f"Trainer.save_dir={tmp_path}/wi",
        "ContrastiveLoaderParams.scan_sample_num=3",
        "--opt-path", "config/hooks/spinfonce.yaml",
    ])
    assert out and all("sp_mask" in d for d in out.values())
    import numpy as np
    for d in out.values():
        assert np.isfinite(d["loss"])
    assert (tmp_path / "wi" / "weight_inspection.npz").exists()
