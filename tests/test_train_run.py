"""Full Trainer.run() on a real (synthetic-image) dataset: decode ->
staging -> device aug -> train steps -> checkpoint -> resume."""
import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.config.plan import TrainPlan
from yolo_continuous_tpu.data.dataset import (YoloDataset,
                                              load_annotation_file,
                                              parse_annotation_lines)
from yolo_continuous_tpu.train.train_loop import Trainer

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rs = np.random.RandomState(0)
    lines = []
    for i in range(6):
        img = rs.randint(0, 255, (48 + 8 * i, 64, 3), np.uint8)
        p = str(root / f"im{i}.jpg")
        cv2.imwrite(p, img)
        # one box per image
        lines.append(f"{p} 5,5,30,30,0\n")
    ann = root / "train.txt"
    ann.write_text("".join(lines))
    return str(ann)


def _plan(ann, tmp_path):
    cfg = yaml.safe_load(open("cfg/chip_tiny.yaml"))
    cfg.update(dict(train=ann, val=ann, epochs=2, batch_size=2,
                    image_size=64, max_boxes=8, workers=0,
                    save_dir=str(tmp_path), save_name="t", resume=True,
                    warmup=True, warmup_epochs=1, warmup_max_iter=4))
    return TrainPlan(cfg)


def test_parse_annotation_lines():
    anns = parse_annotation_lines(["/a/b.jpg 1,2,3,4,0 5,6,7,8,1", "", "/c.jpg"])
    assert len(anns) == 2
    assert anns[0].boxes.shape == (2, 5)
    assert anns[1].boxes.shape == (0, 5)


def test_dataset_batches(tiny_dataset):
    ds = YoloDataset(load_annotation_file(tiny_dataset), image_size=64,
                     max_boxes=8, train=True, epoch_length=2)
    batches = list(ds.epoch_batches(2, shuffle=True, drop_last=True))
    assert len(batches) == 3
    tiles, metas, boxes, masks, mosaic, mixup = batches[0]
    assert tiles.shape == (2, 4, 64, 64, 3)
    assert masks.any()


def test_trainer_run_and_resume(tiny_dataset, tmp_path):
    plan = _plan(tiny_dataset, tmp_path)
    logs = []
    tr = Trainer(plan, dtype=jnp.float32)
    state = tr.run(log=logs.append)
    assert int(state["step"]) == 6  # 2 epochs x 3 steps
    assert os.path.exists(plan.save_path + ".last")
    assert any("best" in l for l in logs)

    # round-4 resume semantics: a COMPLETED schedule resumes as a no-op
    # (the old behavior replayed the whole epoch loop from 0)
    tr2 = Trainer(plan, dtype=jnp.float32)
    logs2 = []
    state2 = tr2.run(log=logs2.append)
    assert any("resumed at step 6" in l for l in logs2)
    assert int(state2["step"]) == 6
    assert not any("epoch" in l and "loss" in l for l in logs2)

    # extending the plan trains only the ADDED epochs
    plan.epochs = 3
    logs3 = []
    state3 = Trainer(plan, dtype=jnp.float32).run(log=logs3.append)
    assert int(state3["step"]) == 9
    assert sum("loss" in l and l.startswith("epoch") for l in logs3) == 1
    assert any(l.startswith("epoch 3/3") for l in logs3)


def test_resume_matches_uninterrupted(tiny_dataset, tmp_path):
    """Kill-at-epoch-k + resume == uninterrupted run (round-4 verdict
    #4): same mosaic window, same lr trajectory, same batches -> the
    SAME final state, not a replayed schedule."""
    ann = tiny_dataset

    def fresh_plan(sub, epochs):
        p = _plan(ann, tmp_path)
        p.epochs = epochs
        p.save_dir = os.path.join(str(tmp_path), sub)
        os.makedirs(p.save_dir, exist_ok=True)
        p.save_path = os.path.join(p.save_dir, "t.msgpack")
        return p

    # arm A: 4 epochs in one go
    plan_a = fresh_plan("a", 4)
    plan_a.resume = False
    logs_a = []
    state_a = Trainer(plan_a, dtype=jnp.float32).run(log=logs_a.append)

    # arm B: SAME 4-epoch plan, killed right after the epoch-2 loss line
    # (before its .last save), then resumed — must pick up at epoch 2 and
    # retrace arm A exactly
    plan_b = fresh_plan("b", 4)
    plan_b.resume = False
    logs_b = []

    class Killed(Exception):
        pass

    def killer(line):
        logs_b.append(line)
        if line.startswith("epoch 2/4 loss"):
            raise Killed

    with pytest.raises(Killed):
        Trainer(plan_b, dtype=jnp.float32).run(log=killer)
    plan_b.resume = True
    logs_b2 = []
    state_b = Trainer(plan_b, dtype=jnp.float32).run(log=logs_b2.append)

    assert any("resumed at step 3" in l for l in logs_b2)
    assert int(state_a["step"]) == int(state_b["step"]) == 12
    # the resumed run replays epochs 2-4 with the SAME loss/lr lines
    lines_a = [l for l in logs_a if l.startswith("epoch") and "loss" in l]
    lines_b = [l for l in logs_b2 if l.startswith("epoch") and "loss" in l]
    strip = lambda ls: [" ".join(l.split()[:6]) for l in ls]  # drop img/s
    assert strip(lines_b) == strip(lines_a)[1:]
    # bitwise-equal final params
    import jax as _jax
    for pa, pb in zip(_jax.tree_util.tree_leaves(state_a["params"]),
                      _jax.tree_util.tree_leaves(state_b["params"])):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_device_cache_budget_gate(tiny_dataset, tmp_path):
    """device_cache auto-enables under the byte budget, stays off above
    it, and an explicit opt-in over budget warns (round-3 advisor #4)."""
    def run_with(cfg_extra):
        plan = _plan(tiny_dataset, tmp_path)
        plan.epochs = 0          # decision runs before the epoch loop
        plan.resume = False
        plan.cfg.update(cfg_extra)
        logs = []
        Trainer(plan, dtype=jnp.float32).run(log=logs.append)
        return "\n".join(logs)

    assert "device cache auto-enabled" in run_with({})
    small = run_with({"device_cache_budget_mb": 0.0001})
    assert "auto-enabled" not in small and "WARNING" not in small
    forced = run_with({"device_cache": True,
                       "device_cache_budget_mb": 0.0001})
    assert "WARNING: device_cache pool" in forced


def test_lr_schedule_clamps_past_end():
    """Past the final epoch the reference's linear lambda goes NEGATIVE
    (main/learningrate_scheduler.py:44); ours clamps at the final value."""
    from yolo_continuous_tpu.ops.schedules import LRSchedule
    sched = LRSchedule(0.01, 0.01, epochs=4, decay="Linear", warmup=False,
                       steps_per_epoch=3)
    end = sched(11).lr_weights            # last scheduled step
    beyond = sched(50).lr_weights         # far past the schedule
    assert beyond == end > 0.0


def test_native_loader_matches_cv2_path(tiny_dataset):
    from yolo_continuous_tpu.data import native_loader
    if not native_loader.ensure_built():
        pytest.skip("native staging library not buildable here")
    anns = load_annotation_file(tiny_dataset)
    ds_py = YoloDataset(anns, image_size=64, max_boxes=8, train=False,
                        seed=3, use_native=False)
    ds_nat = YoloDataset(anns, image_size=64, max_boxes=8, train=False,
                         seed=3, use_native=True)
    b1 = ds_py.batch([0, 1])
    b2 = ds_nat.batch([0, 1])
    np.testing.assert_allclose(b1[1], b2[1], atol=1e-5)   # metas identical
    np.testing.assert_array_equal(b1[2], b2[2])           # boxes identical
    np.testing.assert_array_equal(b1[3], b2[3])           # masks identical
    # pixels: bilinear (native) vs cubic (cv2) staging -> close, not equal
    diff = np.abs(b1[0][:, 0].astype(int) - b2[0][:, 0].astype(int))
    assert diff.mean() < 3.0


def test_validate_pipeline(tiny_dataset, tmp_path):
    """mAP validation end-to-end on the synthetic dataset (random weights)."""
    from yolo_continuous_tpu.detect_api import Detector
    from yolo_continuous_tpu.eval.validate import validate
    plan = _plan(tiny_dataset, tmp_path)
    plan.save_path = "/nonexistent/x.msgpack"
    det = Detector(plan, dtype=jnp.float32)
    out = validate(plan, detector=det, conf_thres=0.0, max_images=4,
                   log=lambda *_: None)
    assert set(out) == {"mAP@0.5", "mAP@0.5:0.95"}
    assert 0.0 <= out["mAP@0.5"] <= 1.0


def test_val_map_every_gates_best_map_checkpoint(tiny_dataset, tmp_path):
    """val_map_every: N runs mAP validation on the EMA weights and keeps a
    best-mAP checkpoint (VERDICT item 5)."""
    plan = _plan(tiny_dataset, tmp_path)
    plan.epochs = 1
    plan.resume = False
    plan.val_map_every = 1
    plan.save_name = "tmap"
    plan.save_path = os.path.join(str(tmp_path), "tmap.msgpack")
    logs = []
    Trainer(plan, dtype=jnp.float32).run(log=logs.append)
    map_lines = [l for l in logs if "mAP@0.5:0.95" in l]
    assert map_lines, logs
    assert os.path.exists(plan.save_path + ".bestmap")


def test_seed_determinism(tiny_dataset, tmp_path):
    """Same seed => identical first-epoch loss (SURVEY §5: deterministic
    PRNG plumbing makes loader race classes structurally impossible)."""
    losses = []
    for _ in range(2):
        plan = _plan(tiny_dataset, tmp_path)
        plan.epochs = 1
        plan.resume = False
        logs = []
        Trainer(plan, dtype=jnp.float32).run(log=logs.append)
        line = [l for l in logs if "loss" in l][0]
        losses.append(line.split("loss ")[1].split(" ")[0])  # numeric value
    assert losses[0] == losses[1]


def test_cache_images(tiny_dataset):
    anns = load_annotation_file(tiny_dataset)
    ds = YoloDataset(anns, image_size=64, max_boxes=8, train=False, seed=1,
                     cache_images=True)
    b1 = ds.batch([0, 1, 2])
    assert len(ds._cache) >= 3
    b2 = ds.batch([0, 1, 2])  # fully served from cache
    np.testing.assert_array_equal(b1[0], b2[0])
    np.testing.assert_array_equal(b1[1], b2[1])
    # cached and uncached paths agree
    ds2 = YoloDataset(anns, image_size=64, max_boxes=8, train=False, seed=1,
                      cache_images=False)
    b3 = ds2.batch([0, 1, 2])
    np.testing.assert_array_equal(b1[0], b3[0])


def test_remat_step_matches_plain(tiny_dataset, tmp_path):
    """jax.checkpoint over the forward (Trainer remat flag / plan key)
    must not change the step's math — only its memory/traffic profile."""
    plan = _plan(tiny_dataset, tmp_path)

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    labels = np.zeros((2, 8, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    lmask = np.zeros((2, 8), bool)
    lmask[:, 0] = True
    labels, lmask = jnp.asarray(labels), jnp.asarray(lmask)

    outs = []
    for remat in (False, True):
        tr = Trainer(plan, dtype=jnp.float32, remat=remat)
        assert tr.remat is remat
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.jitted_train_step()(state, images, labels, lmask,
                                          0.01, 0.1, 0.9)
        outs.append((float(m["loss"]),
                     float(jax.tree.reduce(
                         lambda a, b: a + float(jnp.sum(jnp.abs(b))),
                         state["params"], 0.0))))
    (l0, p0), (l1, p1) = outs
    assert abs(l0 - l1) < 1e-5 * max(1.0, abs(l0))
    assert abs(p0 - p1) < 1e-4 * max(1.0, abs(p0))


@pytest.mark.parametrize("mode", ["conv", "dots", True])
def test_remat_policies_are_identity(mode, tiny_dataset, tmp_path):
    """Selective rematerialization must not change the math: one train
    step with each remat policy produces the same loss and updated
    params as the un-rematerialized step."""
    plan = _plan(tiny_dataset, tmp_path)

    rs = np.random.RandomState(1)
    images = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    labels = np.zeros((2, 8, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    lmask = np.zeros((2, 8), bool)
    lmask[:, 0] = True
    labels, lmask = jnp.asarray(labels), jnp.asarray(lmask)

    def one_step(remat):
        tr = Trainer(plan, dtype=jnp.float32, remat=remat)
        state = tr.init_state(jax.random.PRNGKey(0))
        new_state, metrics = tr.jitted_train_step()(
            state, images, labels, lmask, 0.01, 0.1, 0.9)
        return (float(metrics["loss"]),
                np.asarray(jax.tree_util.tree_leaves(new_state["params"])[0]))

    base_loss, base_leaf = one_step(False)
    loss, leaf = one_step(mode)
    np.testing.assert_allclose(loss, base_loss, rtol=1e-6)
    np.testing.assert_allclose(leaf, base_leaf, rtol=1e-5, atol=1e-7)


def test_xla_opts_plan_key_compiles_and_matches(tiny_dataset, tmp_path):
    """The `xla_opts` plan key must ship per-jit compiler options with
    the train step (the only vehicle that reaches a remote TPU
    compiler; XLA_FLAGS is rejected locally for backend flags) without
    changing the math."""
    plan = _plan(tiny_dataset, tmp_path)

    rs = np.random.RandomState(2)
    images = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    labels = np.zeros((2, 8, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    lmask = np.zeros((2, 8), bool)
    lmask[:, 0] = True
    labels, lmask = jnp.asarray(labels), jnp.asarray(lmask)

    outs = []
    for opts in (None, {"xla_embed_ir_in_executable": True}):
        plan.cfg.pop("xla_opts", None)
        if opts:
            plan.cfg["xla_opts"] = opts
        tr = Trainer(plan, dtype=jnp.float32)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.jitted_train_step()(state, images, labels, lmask,
                                          0.01, 0.1, 0.9)
        outs.append(float(m["loss"]))
    assert abs(outs[0] - outs[1]) < 1e-6 * max(1.0, abs(outs[0]))


def test_device_cache_pool_matches_host_path(tiny_dataset):
    """augment_batch_from_pool on a device-resident staged pool +
    batch_plan index batches must reproduce the host-assembled
    augment_batch pipeline exactly (same seed -> same tile plans ->
    same augmented images/labels), since staging is deterministic."""
    from yolo_continuous_tpu.ops.augment import (AugConfig, augment_batch,
                                                 augment_batch_from_pool)

    ann = load_annotation_file(tiny_dataset)
    mk = lambda: YoloDataset(ann, 64, 8, mosaic=True, mixup=True,
                             mosaic_prob=0.7, mixup_prob=0.5,
                             epoch_length=2, train=True, seed=3,
                             cache_images=True)
    ds_host, ds_pool = mk(), mk()
    pool = tuple(jnp.asarray(a) for a in ds_pool.staged_pool())
    cfg = AugConfig(size=64)
    key = jax.random.PRNGKey(7)

    host_batches = list(ds_host.epoch_batches(4, shuffle=True,
                                              drop_last=False))
    plan_batches = list(ds_pool.epoch_plans(4, shuffle=True,
                                            drop_last=False))
    assert len(host_batches) == len(plan_batches) >= 1
    for hb, pb in zip(host_batches, plan_batches):
        tiles, metas, boxes, masks, mosaic, mixup = hb
        tile_idx, p_mosaic, p_mixup = pb
        np.testing.assert_array_equal(mosaic, p_mosaic)
        np.testing.assert_array_equal(mixup, p_mixup)
        img_h, lab_h, m_h = augment_batch(
            key, jnp.asarray(tiles), jnp.asarray(metas), jnp.asarray(boxes),
            jnp.asarray(masks), jnp.asarray(mosaic), jnp.asarray(mixup),
            cfg=cfg, max_gt=8, train=True)
        img_p, lab_p, m_p = augment_batch_from_pool(
            key, *pool, jnp.asarray(tile_idx), jnp.asarray(p_mosaic),
            jnp.asarray(p_mixup), cfg=cfg, max_gt=8, train=True)
        np.testing.assert_allclose(np.asarray(img_h), np.asarray(img_p),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(lab_h), np.asarray(lab_p),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(m_h), np.asarray(m_p))


def test_warm_start_from_checkpoint(tiny_dataset, tmp_path):
    """init_weights_from: weights-only warm start — params/batch_stats
    (EMA tree) come from the donor checkpoint, but step/optimizer/EMA
    start fresh (fine-tune semantics; counterpart of the reference's
    pretrained init, nets/backbone.py:118-125)."""
    donor_plan = _plan(tiny_dataset, tmp_path)
    donor_plan.epochs = 1
    donor_plan.resume = False
    donor_plan.save_name = "donor"
    donor_plan.save_path = os.path.join(str(tmp_path), "donor.msgpack")
    tr = Trainer(donor_plan, dtype=jnp.float32)
    donor_state = tr.run(log=lambda *_: None)
    assert os.path.exists(donor_plan.save_path)

    ft_plan = _plan(tiny_dataset, tmp_path)
    ft_plan.epochs = 0                       # init only, no steps
    ft_plan.resume = False
    ft_plan.save_name = "ft"
    ft_plan.save_path = os.path.join(str(tmp_path), "ft.msgpack")
    ft_plan.cfg["init_weights_from"] = donor_plan.save_path
    logs = []
    tr2 = Trainer(ft_plan, dtype=jnp.float32)
    state = tr2.run(log=logs.append)
    assert any("warm start" in l for l in logs)
    assert int(state["step"]) == 0           # fresh schedule
    # params equal the donor's EMA tree (the checkpointed serving weights)
    from yolo_continuous_tpu.train.checkpoint import try_load
    donor_ck = try_load(donor_plan.save_path,
                        tr.init_state(jax.random.PRNGKey(0)))
    want = jax.tree_util.tree_leaves(donor_ck["ema"].tree["params"])
    got = jax.tree_util.tree_leaves(state["params"])
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    # EMA restarts FROM those weights (not the donor's optimizer history)
    got_ema = jax.tree_util.tree_leaves(state["ema"].tree["params"])
    for w, g in zip(want, got_ema):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_stop_after_epoch_caps_loop(tiny_dataset, tmp_path):
    """stop_after_epoch trains only the first E epochs of the schedule
    (LR horizon unchanged) — the budget-matched A/B pairing knob."""
    cfg = yaml.safe_load(open("cfg/chip_tiny.yaml"))
    cfg.update(dict(train=tiny_dataset, val=tiny_dataset, epochs=4,
                    batch_size=2, image_size=64, max_boxes=8, workers=0,
                    save_dir=str(tmp_path), save_name="cap", resume=False,
                    warmup=False, stop_after_epoch=2))
    plan = TrainPlan(cfg)
    logs = []
    state = Trainer(plan, dtype=jnp.float32).run(log=logs.append)
    steps_per_epoch = 3  # 6 imgs / bs 2
    assert int(state["step"]) == 2 * steps_per_epoch
    assert any("epoch 2/4" in l for l in logs)
    assert not any("epoch 3/4" in l for l in logs)
