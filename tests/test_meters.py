import numpy as np
import pytest

from spcl_tpu.meters import (
    AverageValueMeter, AverageValueListMeter, MeterInterface, Storage,
    SurfaceMeter, UniversalDice, dice_stats_from_labels,
    hausdorff_distance, average_surface_distance,
)


def test_average_meter_welford():
    m = AverageValueMeter()
    vals = [1.0, 2.0, 3.0, 4.0]
    for v in vals:
        m.add(v)
    np.testing.assert_allclose(m.mean, np.mean(vals))
    np.testing.assert_allclose(m.std, np.std(vals, ddof=1))
    m.reset()
    assert np.isnan(m.mean)


def test_average_list_meter():
    m = AverageValueListMeter()
    m.add([1e-3, 1e-4])
    m.add([2e-3, 2e-4])
    s = m.summary()
    np.testing.assert_allclose(s["lr_0"], 1.5e-3)


def test_universal_dice_per_scan_grouping():
    meter = UniversalDice(C=2, report_axises=[1])
    # scan A: two slices, perfect prediction
    pred_a = np.array([[[1, 1], [0, 0]], [[0, 1], [0, 1]]])
    meter.add_labels(pred_a, pred_a, group_name=["scanA", "scanA"])
    # scan B: completely wrong prediction on class 1
    pred_b = np.array([[[1, 1], [1, 1]]])
    targ_b = np.array([[[0, 0], [0, 0]]])
    meter.add_labels(pred_b, targ_b, group_name=["scanB"])
    per_group = meter.per_group_dice()
    np.testing.assert_allclose(per_group["scanA"][1], 1.0, rtol=1e-4)
    assert per_group["scanB"][1] < 1e-5
    s = meter.summary()
    np.testing.assert_allclose(s["DSC1"], np.mean([per_group["scanA"][1], per_group["scanB"][1]]))
    assert s["DSC_mean"] == s["DSC1"]


def test_universal_dice_3d_vs_2d_grouping():
    """3D dice over a scan differs from mean of 2D slice dices."""
    # slice 1: half right; slice 2: fully right, different sizes
    pred = np.array([[[1, 0], [0, 0]], [[1, 1], [1, 1]]])
    targ = np.array([[[1, 1], [0, 0]], [[1, 1], [1, 1]]])
    m3d = UniversalDice(C=2, report_axises=[1])
    m3d.add_labels(pred, targ, group_name="scan")  # one scan
    m2d = UniversalDice(C=2, report_axises=[1])
    m2d.add_labels(pred, targ, group_name=None)  # per-slice
    d3 = m3d.summary()["DSC1"]
    d2 = m2d.summary()["DSC1"]
    # 3D: I=5,U=... inter=1+4=5, union=2+1+4+4... compute: slice1 I=1,U=3; slice2 I=4,U=8
    np.testing.assert_allclose(d3, (2 * 5 + 1e-6) / (11 + 1e-6), rtol=1e-5)
    np.testing.assert_allclose(d2, np.mean([(2 * 1 + 1e-6) / (3 + 1e-6), (2 * 4 + 1e-6) / (8 + 1e-6)]), rtol=1e-5)
    assert abs(d3 - d2) > 1e-3


def test_dice_stats_valid_mask():
    import jax.numpy as jnp
    pred = jnp.asarray(np.array([[[1, 1], [1, 1]], [[0, 0], [0, 0]]]))
    targ = jnp.asarray(np.array([[[1, 1], [1, 1]], [[1, 1], [1, 1]]]))
    inter, union = dice_stats_from_labels(pred, targ, 2, valid=jnp.asarray([1.0, 0.0]))
    assert float(inter[0, 1]) == 4.0
    assert float(union[0, 1]) == 8.0
    assert float(union[1, 1]) == 0.0  # padded slice contributes nothing


def test_surface_distances():
    a = np.zeros((16, 16), bool)
    a[4:12, 4:12] = True
    b = np.zeros((16, 16), bool)
    b[5:13, 5:13] = True  # shifted by 1
    hd = hausdorff_distance(a, b)
    assert 1.0 <= hd <= 2.0
    assd = average_surface_distance(a, b)
    assert 0 < assd <= hd
    assert hausdorff_distance(a, a) == 0.0
    assert np.isnan(hausdorff_distance(a, np.zeros_like(a)))


def test_surface_meter_threaded():
    m = SurfaceMeter(C=2, report_axises=[1], metername="hausdorff95", threaded=True)
    pred = np.zeros((2, 16, 16), np.int32)
    pred[:, 4:12, 4:12] = 1
    targ = np.zeros_like(pred)
    targ[:, 5:13, 5:13] = 1
    m.add(pred, targ)
    s = m.summary()
    assert np.isfinite(s["HD951"])


def test_meter_interface_focus_groups():
    mi = MeterInterface(default_focus="tra")
    mi.register_meter("loss", AverageValueMeter())
    with mi.focus_on("hookA"):
        mi.register_meter("loss", AverageValueMeter())
        mi["loss"].add(5.0)
    mi["loss"].add(1.0)
    stats = mi.statistics()
    assert stats["tra"]["loss"]["mean"] == 1.0
    assert stats["hookA"]["loss"]["mean"] == 5.0
    with mi.focus_on("_hidden"):
        mi.register_meter("x", AverageValueMeter())
    assert "_hidden" not in mi.statistics()


def test_storage_roundtrip(tmp_path):
    st = Storage(save_dir=str(tmp_path))
    st.put_epoch(0, {"tra": {"loss": {"mean": 1.0}}})
    st.put_epoch(1, {"tra": {"loss": {"mean": 0.5}}})
    st.flush()
    assert (tmp_path / "storage.csv").exists()
    df = st.to_dataframe()
    assert df.loc[1, "tra/loss/mean"] == 0.5
    st2 = Storage()
    st2.load_state_dict(st.state_dict())
    assert st2.history[0] == st.history[0]
