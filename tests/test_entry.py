"""Entry-point integration tests: config -> trainer -> full tiny run."""
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


def test_main_finetune(tmp_path):
    import main as entry
    score = entry.main(TINY + ["Trainer.name=ft", f"Trainer.save_dir={tmp_path}"])
    assert 0.0 <= score <= 1.0
    assert (tmp_path / "last.ckpt").exists()
    assert (tmp_path / "config.yaml").exists()


def test_main_semi_with_spinfonce_hook(tmp_path):
    import main as entry
    score = entry.main(TINY + [
        "Trainer.name=semi", f"Trainer.save_dir={tmp_path}",
        "--opt-path", "config/hooks/spinfonce.yaml",
    ])
    assert 0.0 <= score <= 1.0


def test_main_pretrain_encoder_pipeline(tmp_path):
    """The paper pipeline: encoder pretrain then finetune sweep (tiny)."""
    import main_pretrain_encoder as entry
    results = entry.main(TINY + [
        f"Trainer.save_dir={tmp_path}", "Data.ratios=[1,2]",
        "ContrastiveLoaderParams.scan_sample_num=3",
        "--opt-path", "config/hooks/spinfonce.yaml",
    ])
    assert isinstance(results, dict) and len(results) > 0
    for ratio, dsc in results.items():
        assert 0.0 <= dsc <= 1.0, (ratio, dsc)
    assert (tmp_path / "pre" / "last.ckpt").exists()


def test_val_requires_checkpoint():
    import val as entry
    with pytest.raises(SystemExit):
        entry.main(TINY)


def test_production_configs_build_and_run(tmp_path):
    """config/specific/production_{finetune,semi}.yaml (round 5): the shipped
    production shapes parse, build, and run a tiny epoch with packed eval on
    (batch sizes shrunk — the tiny fixture has few slices; the yaml's
    batch/packed_eval knobs themselves are exercised verbatim elsewhere on
    the device bench)."""
    import main as entry
    for cfg in ("config/specific/production_finetune.yaml",
                "config/specific/production_semi.yaml"):
        score = entry.main(TINY + [
            f"Trainer.save_dir={tmp_path}/{cfg.split('/')[-1]}",
            "Trainer.packed_eval=12",
            "--opt-path", cfg,
        ])
        assert 0.0 <= score <= 1.0
