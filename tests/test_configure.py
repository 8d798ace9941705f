import pytest
import yaml

from spcl_tpu.configure import (
    ConfigManager, UnknownKeyError, dictionary_merge_by_hierachy,
    extract_params_with_key_prefix, remove_sentinel_keys,
)
from spcl_tpu.configure.yaml_parser import parse_dotted_assignments
from spcl_tpu.utils import ntuple


def test_merge_by_hierarchy():
    base = {"A": {"x": 1, "y": 2}, "B": 3}
    new = {"A": {"y": 20, "z": 30}}
    merged = dictionary_merge_by_hierachy(base, new)
    assert merged == {"A": {"x": 1, "y": 20, "z": 30}, "B": 3}
    assert base["A"]["y"] == 2  # deepcopy


def test_remove_sentinel():
    cfg = {"A": {"x": 1}, "B": "remove", "C": {"D": "remove", "e": 5}}
    assert remove_sentinel_keys(cfg) == {"A": {"x": 1}, "C": {"e": 5}}


def test_prefix_extraction():
    cfg = {"Trainer": {"pre_max_epoch": 80, "ft_max_epoch": 60, "save_dir": "x"}}
    assert extract_params_with_key_prefix(cfg, "pre_") == {"Trainer": {"max_epoch": 80}}
    assert extract_params_with_key_prefix(cfg, "ft_") == {"Trainer": {"max_epoch": 60}}


def test_dotted_cli_parsing():
    tree = parse_dotted_assignments(["Optim.lr=1e-5", "Trainer.name=semi", "Data.ratios=[1,2]", "flag=true"])
    assert tree["Optim"]["lr"] == 1e-5
    assert tree["Trainer"]["name"] == "semi"
    assert tree["Data"]["ratios"] == [1, 2]
    assert tree["flag"] is True


def test_typed_cli_parsing():
    tree = parse_dotted_assignments(["Arch.num:!str=10"])
    assert tree["Arch"]["num"] == "10"


def test_config_manager_merge_and_strict(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"Optim": {"lr": 1e-7, "name": "radam"}, "Trainer": {"max_epoch": 5}}))
    opt = tmp_path / "hook.yaml"
    opt.write_text(yaml.safe_dump({"InfonceParams": {"feature_names": "Conv5"}}))

    cm = ConfigManager(str(base), str(opt))
    cm.add_cli_config({"Optim": {"lr": 2e-7}})
    cfg = cm.merged_config
    assert cfg["Optim"]["lr"] == 2e-7
    assert cfg["InfonceParams"]["feature_names"] == "Conv5"

    cm_bad = ConfigManager(str(base)).add_cli_config({"Optm": {"lr": 1.0}})
    with pytest.raises(UnknownKeyError, match="Optim"):
        _ = cm_bad.merged_config


def test_cli_can_remove_opt_block(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"A": {"x": 1}}))
    opt = tmp_path / "o.yaml"
    opt.write_text(yaml.safe_dump({"Hook": {"w": 1.0}}))
    cm = ConfigManager(str(base), str(opt)).add_cli_config({"Hook": "remove"})
    assert "Hook" not in cm.merged_config


def test_ntuple_broadcast():
    assert ntuple(3)("Conv5") == ("Conv5",) * 3
    assert ntuple(3)(1.0) == (1.0, 1.0, 1.0)
    assert ntuple(2)(["a", "b"]) == ("a", "b")
    with pytest.raises(ValueError):
        ntuple(3)(["a", "b"])


def test_specific_config_presets_build_hooks():
    """config/specific/*.yaml (ports of the reference's per-method presets,
    /root/reference/config/specific) parse and activate the right hooks."""
    from pathlib import Path
    from spcl_tpu.utils import yaml_load
    from spcl_tpu.hooks import create_hook_from_config

    root = Path(__file__).parents[1] / "config" / "specific"
    expected = {
        "entmin.yaml": {"EntropyMinTrainerHook"},
        "iic.yaml": {"DiscreteMITrainHook", "ConsistencyTrainerHook"},
        "infonce.yaml": {"INFONCEHook"},
        "mt.yaml": {"MeanTeacherTrainerHook"},
        "pretrain.yaml": set(),  # schedule knobs only
        "selfpaced_infonce.yaml": {"SelfPacedINFONCEHook"},
        "uda.yaml": {"ConsistencyTrainerHook"},
        "production_pretrain.yaml": {"SelfPacedINFONCEHook"},
        "bigbatch_pretrain.yaml": {"SelfPacedINFONCEHook"},
    }
    for name, want in expected.items():
        cfg = yaml_load(root / name)
        hooks = create_hook_from_config(cfg, max_epoch=80)
        assert {h.__class__.__name__ for h in hooks} == want, name
