import numpy as np

from spcl_tpu.schedulers import (ExpScheduler, InverseExpScheduler, LinearScheduler,
                                 PScheduler, RampScheduler, warmup_cosine_epoch_schedule)
from spcl_tpu.utils.rng import KeyChain


def test_pscheduler_gamma_curve():
    s = PScheduler(max_epoch=80, begin_value=1e4, end_value=20, p=0.5)
    assert s.get_value(0) == 1e4
    np.testing.assert_allclose(s.get_value(80), 20.0, rtol=1e-6)
    # p=0.5 -> square-root progress: halfway value below linear midpoint
    linear_mid = (1e4 + 20) / 2
    assert s.get_value(40) < linear_mid
    s.step()
    assert s.epoch == 1
    st = s.state_dict()
    s2 = PScheduler(max_epoch=80, begin_value=1e4, end_value=20, p=0.5)
    s2.load_state_dict(st)
    assert s2.value == s.value


def test_warmup_cosine_schedule_parity():
    # reference: base_lr * ((mult-1)*e/warmup + 1) during warmup, then cosine
    # from base*mult to eta_min over max_epoch - warmup epochs
    sched = warmup_cosine_epoch_schedule(base_lr=5e-7, multiplier=300, warmup_max=10,
                                         max_epoch=80, steps_per_epoch=100)
    lr0 = float(sched(0))
    np.testing.assert_allclose(lr0, 5e-7, rtol=1e-6)
    lr_mid_warm = float(sched(5 * 100))
    np.testing.assert_allclose(lr_mid_warm, 5e-7 * (299 * 5 / 10 + 1), rtol=1e-5)
    lr_peak = float(sched(10 * 100))
    np.testing.assert_allclose(lr_peak, 5e-7 * 300, rtol=1e-5)
    lr_end = float(sched(80 * 100))
    np.testing.assert_allclose(lr_end, 1e-7, rtol=1e-4)
    # constant within an epoch
    assert float(sched(12 * 100)) == float(sched(12 * 100 + 99))


def test_ramp_and_linear_exp_schedulers():
    r = RampScheduler(begin_epoch=0, max_epoch=10, min_value=0.0, max_value=1.0)
    assert r.get_value(0) < r.get_value(5) < r.get_value(10) == 1.0
    l = LinearScheduler(max_epoch=10, begin_value=0.0, end_value=1.0)
    np.testing.assert_allclose(l.get_value(5), 0.5)
    e = ExpScheduler(max_epoch=10, begin_value=0.0, end_value=1.0)
    ie = InverseExpScheduler(max_epoch=10, begin_value=0.0, end_value=1.0)
    assert e.get_value(5) < 0.5 < ie.get_value(5)  # convex vs concave ramps
    np.testing.assert_allclose(e.get_value(10), 1.0, rtol=1e-6)
    np.testing.assert_allclose(ie.get_value(10), 1.0, rtol=1e-6)


def test_trainer_gamma_clock_matches_reference():
    """The trainer's 1-based epoch loop must feed hooks a 0-based scheduler
    clock: the reference reads scheduler.value at internal epoch 0 on the
    first epoch and steps afterwards (semi_seg/hooks/infonce.py:133-136), so
    epoch 1 uses begin_value and get_value(max_epoch) is never reached."""
    from spcl_tpu.hooks import SelfPacedINFONCEHook
    from spcl_tpu.training.trainer import Trainer

    hook = SelfPacedINFONCEHook(name="spinfonce/Conv5/partition",
                                feature_name="Conv5", contrast_on="partition",
                                begin_value=1e4, end_value=20, mode="soft",
                                max_epoch=80)

    class _Clock:  # minimal stand-in exposing what _hook_scalars reads
        _hooks = [hook]
        _cur_epoch = 1

    assert Trainer._hook_scalars(_Clock)[hook.name]["gamma"] == 1e4
    _Clock._cur_epoch = 80
    got = Trainer._hook_scalars(_Clock)[hook.name]["gamma"]
    np.testing.assert_allclose(got, hook.scheduler.get_value(79), rtol=0)
    assert got != hook.scheduler.get_value(80)


def test_keychain_deterministic_and_resumable():
    import jax
    a = KeyChain(seed=5)
    k1, k2 = a.next(), a.next()
    b = KeyChain(seed=5)
    b.load_state_dict({"seed": 5, "counter": 1})
    k2b = b.next()
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k2b))
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))
