"""Schedule parity tests (main/learningrate_scheduler.py, main/warm_up.py)."""
import math

from yolo_continuous_tpu.ops.schedules import DecayType, LRSchedule, decay_factor_fn


def test_decay_endpoints():
    epochs, lrF = 100, 0.01
    for name in ("Linear", "Cosine", "Exponential", "Natural_Exponential", "InverseTime"):
        lf = decay_factor_fn(DecayType.from_name(name), lrF, epochs)
        assert abs(lf(0) - 1.0) < 1e-6, name  # factor starts at 1


def test_linear_formula():
    lf = decay_factor_fn(DecayType.Linear, 0.1, 11)
    # y2 - (y2-y1)*(1 - x/(steps-1)); main/learningrate_scheduler.py:40-44
    assert abs(lf(0) - 1.0) < 1e-9
    assert abs(lf(10) - 0.1) < 1e-9
    assert abs(lf(5) - (0.1 - (0.1 - 1.0) * 0.5)) < 1e-9


def test_cosine_formula():
    lf = decay_factor_fn(DecayType.Cosine, 0.01, 100)
    x = 37
    want = 0.01 - (0.01 - 1.0) * (1 + math.cos(x * math.pi / 100)) / 2
    assert abs(lf(x) - want) < 1e-12


def test_unknown_decay_is_identity():
    lf = decay_factor_fn(DecayType.from_name("bogus"), 0.1, 10)
    assert lf(7) == 7  # NA lambda x: x (learningrate_scheduler.py:33-37)


def test_warmup_interp():
    s = LRSchedule(lr_initial=0.01, lr_final=0.01, epochs=100, decay="Linear",
                   momentum=0.937, warmup=True, warmup_epochs=5,
                   warmup_max_iter=1000, warmup_momentum=0.8,
                   warmup_bias_lr=0.1, steps_per_epoch=100)
    h0 = s(0)
    assert h0.lr_weights == 0.0
    assert abs(h0.lr_bias - 0.1) < 1e-9
    assert abs(h0.momentum - 0.8) < 1e-9
    hmid = s(250)  # epoch 2 (< warmup_epochs=5), 1/4 through the 1000-iter limit
    assert abs(hmid.lr_weights - 0.0025) < 1e-9
    assert abs(hmid.lr_bias - (0.1 + (0.01 - 0.1) * 0.25)) < 1e-9
    # after warm-up window -> epoch decay value
    hlate = s(2000)  # epoch 20
    assert abs(hlate.lr_weights - s.epoch_lr(20)) < 1e-12
    assert hlate.momentum == 0.937


def test_warmup_limit_uses_max_iter():
    # train.py:59: limit = max(warmup_max_iter, steps_per_epoch*warmup_epochs)
    s = LRSchedule(0.01, 0.01, 100, "Linear", warmup_epochs=5,
                   warmup_max_iter=1000, steps_per_epoch=10)
    assert s.warmup_limit == 1000
    s2 = LRSchedule(0.01, 0.01, 100, "Linear", warmup_epochs=5,
                    warmup_max_iter=1000, steps_per_epoch=500)
    assert s2.warmup_limit == 2500
