"""SimOTA loss parity vs the torch reference (losses/yolo_loss.py).

The fixture is regenerated with torch's seeded RNG (torch is in the image,
CPU-only); the golden total was computed once by running the reference
implementation on exactly this fixture: loss = 3.3405237.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.losses.yolo_loss import LossConfig, yolo_loss

NC = 20
FLAT = [[12, 16], [19, 36], [40, 28], [36, 75], [76, 55], [72, 146],
        [142, 110], [192, 243], [459, 401]]
MASK = [[6, 7, 8], [3, 4, 5], [0, 1, 2]]
ANCHORS = tuple(tuple(tuple(FLAT[j]) for j in m) for m in MASK)
REFERENCE_GOLDEN = 3.3405237197875977


def _fixture(max_gt=16):
    torch.manual_seed(0)
    preds_t = [torch.randn(2, 3 * (5 + NC), s, s) * 2 for s in (20, 40, 80)]
    preds = []
    for p in preds_t:
        bs, _, h, w = p.shape
        q = p.numpy().reshape(bs, 3, 5 + NC, h, w).transpose(0, 1, 3, 4, 2)
        preds.append(jnp.asarray(q.transpose(0, 2, 3, 1, 4)))  # (bs,h,w,na,no)
    rows = np.array([
        [0, 3, 0.5, 0.5, 0.3, 0.4],
        [0, 7, 0.2, 0.3, 0.1, 0.15],
        [1, 0, 0.7, 0.6, 0.5, 0.5],
        [1, 12, 0.4, 0.8, 0.05, 0.08],
        [1, 12, 0.42, 0.78, 0.06, 0.1],
    ], np.float32)
    targets = np.zeros((2, max_gt, 5), np.float32)
    tmask = np.zeros((2, max_gt), bool)
    counts = [0, 0]
    for r in rows:
        b = int(r[0])
        targets[b, counts[b]] = r[1:6]
        tmask[b, counts[b]] = True
        counts[b] += 1
    return preds, jnp.asarray(targets), jnp.asarray(tmask)


def _cfg(max_gt=16):
    return LossConfig(num_classes=NC, input_size=(640, 640), strides=(32, 16, 8),
                      anchors=ANCHORS, max_gt=max_gt)


_JITTED = {}


def _loss_fn(max_gt=16):
    # one compile per capacity; shared across tests (CPU compiles are slow)
    if max_gt not in _JITTED:
        cfg = _cfg(max_gt)
        _JITTED[max_gt] = jax.jit(
            lambda ps, t, m: yolo_loss(list(ps), t, m, cfg))
    return _JITTED[max_gt]


def test_matches_reference_golden():
    preds, targets, tmask = _fixture()
    loss, parts = _loss_fn(16)(tuple(preds), targets, tmask)
    assert abs(float(loss) - REFERENCE_GOLDEN) / REFERENCE_GOLDEN < 1e-4
    assert float(parts["num_fg"]) > 0


def test_padding_invariance():
    # growing the static GT capacity must not change the result
    p16, t16, m16 = _fixture(16)
    p32, t32, m32 = _fixture(32)
    l16, _ = _loss_fn(16)(tuple(p16), t16, m16)
    l32, _ = _loss_fn(32)(tuple(p32), t32, m32)
    assert abs(float(l16) - float(l32)) < 1e-4


def test_no_gt_image():
    preds, targets, tmask = _fixture()
    empty_mask = jnp.zeros_like(tmask)
    loss, parts = _loss_fn(16)(tuple(preds), targets, empty_mask)
    # only the obj (negative) term survives; finite and positive
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(parts["box"]) == 0.0
    assert float(parts["num_fg"]) == 0


def test_grad_finite_nonzero():
    preds, targets, tmask = _fixture()
    cfg = _cfg()
    grad_fn = jax.jit(jax.grad(lambda ps: yolo_loss(list(ps), targets, tmask, cfg)[0]))
    grads = grad_fn(tuple(preds))
    gmax = max(float(jnp.abs(g).max()) for g in grads)
    assert np.isfinite(gmax) and gmax > 0


def test_widened_aux_candidates():
    """find_5_positive (g=1.0) selects the full 5-cell stencil where the
    lead assignment (g=0.5) picks center + 2 nearest (YOLOv7 aux
    coarse-to-fine recipe)."""
    from yolo_continuous_tpu.losses.yolo_loss import _candidates_level

    tgt = jnp.asarray([[0.0, 5.3 / 16, 5.3 / 16, 0.2, 0.2]], jnp.float32)
    tmask = jnp.asarray([True])
    anchors_f = jnp.asarray([[3.0, 3.0]], jnp.float32)
    *_, m_lead = _candidates_level(tgt, tmask, 16, 16, anchors_f, 4.0, 0.5)
    *_, m_aux = _candidates_level(tgt, tmask, 16, 16, anchors_f, 4.0, 1.0)
    assert int(m_lead.sum()) == 3          # center + x-left + y-up
    assert int(m_aux.sum()) == 5           # full stencil
    # widened set is a superset of the lead set
    assert bool(jnp.all(m_aux | ~m_lead))


def test_aux_loss_uses_widened_assignment():
    """IAuxDetect maps flow through the second (g=1.0) SimOTA pass and
    contribute grads (aux_weight gate)."""
    import dataclasses

    cfg = LossConfig(num_classes=3, input_size=(64, 64),
                     strides=(8, 16, 32),
                     anchors=(((12, 16), (19, 36), (40, 28)),
                              ((36, 75), (76, 55), (72, 146)),
                              ((142, 110), (192, 243), (459, 401))),
                     max_gt=4)
    rs = np.random.RandomState(0)
    preds = [jnp.asarray(rs.randn(2, 64 // s, 64 // s, 3, 8) * 0.1,
                         jnp.float32) for s in (8, 16, 32)]
    auxp = [jnp.asarray(rs.randn(2, 64 // s, 64 // s, 3, 8) * 0.1,
                        jnp.float32) for s in (8, 16, 32)]
    tgt = np.zeros((2, 4, 5), np.float32)
    tgt[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    tmask = np.zeros((2, 4), bool)
    tmask[:, 0] = True
    tgt, tmask = jnp.asarray(tgt), jnp.asarray(tmask)

    base, _ = yolo_loss(preds, tgt, tmask, cfg)
    with_aux, _ = yolo_loss(preds, tgt, tmask, cfg, aux_preds=auxp)
    assert float(with_aux) > float(base)   # aux term adds loss
    zero_w = dataclasses.replace(cfg, aux_weight=0.0)
    no_aux, _ = yolo_loss(preds, tgt, tmask, zero_w, aux_preds=auxp)
    assert abs(float(no_aux) - float(base)) < 1e-6
    g = jax.grad(lambda a: yolo_loss(preds, tgt, tmask, cfg,
                                     aux_preds=a)[0])(auxp)
    assert all(bool(jnp.isfinite(x).all()) for x in g)
    assert any(float(jnp.abs(x).max()) > 0 for x in g)
