"""Training loop: jitted train step, warm-up/decay, EMA, checkpointing.

Parity target: ``train.py:23-121`` — the epoch/step loop with AMP,
warm-up gate, per-epoch LR decay, best-train-loss validation and
checkpoint save. TPU re-design:

- one jitted ``train_step`` = forward (bf16 compute) + SimOTA loss +
  grads + 3-group optimizer + EMA (fixes the reference's unwired
  ``ModelEMA``); no GradScaler — bf16 needs no loss scaling,
- augmentation runs on device right before the step (``ops/augment``),
- the step is compiled once; lr/momentum enter as traced scalars,
- under a ``parallel.mesh`` Mesh the batch shards over the ``data`` axis
  and gradients all-reduce over ICI automatically (replaces
  ``torch.nn.DataParallel``, train.py:41),
- checkpoints carry params + EMA + optimizer + step (exact resume;
  the reference loses optimizer/epoch state, SURVEY §5).
"""
from __future__ import annotations

import gc
import math
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.plan import TrainPlan, cvt_cfg
from ..data.dataset import PrefetchLoader, YoloDataset, load_annotation_file
from ..losses.yolo_loss import LossConfig, yolo_loss
from ..nn.builder import YoloModel, build_model_spec
from ..ops.augment import (AugConfig, aug_config_from_plan, augment_batch,
                           augment_batch_from_pool)
from ..ops.schedules import LRSchedule, StepHyper
from ..parallel.mesh import (data_sharding, make_mesh, param_sharding_rule,
                             replicated, shard_batch)
from ..utils.env import setup_compile_cache
from .checkpoint import save_checkpoint, try_load
from .ema import EMAState, ema_init, ema_update
from .optimizer import Optimizer, label_params, make_optimizer


def default_dtype():
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def remat_policy(name):
    """Named selective-rematerialization policies for the ``remat`` plan
    key. ``True``/"full" recomputes the WHOLE forward in the backward
    (measured 87 vs 160 img/s at yolov7@640 — a memory knob, not a speed
    knob). The selective policies keep the expensive MXU results and
    recompute only cheap fused elementwise tails, trading spare MXU
    FLOPs for HBM activation traffic (the step is bandwidth-bound,
    README roofline):

    - "conv": save conv/matmul outputs; recompute BN/activation/concat
      tails in the backward.
    - "dots": jax's dots_with_no_batch_dims policy (matmuls only; convs
      recompute — usually too aggressive for a conv net, kept for
      measurement).
    """
    if name in (True, "full"):
        return None                      # jax.checkpoint default: save nothing
    if name == "conv":
        def policy(prim, *_, **__):
            return prim.name in ("conv_general_dilated", "dot_general")
        return policy
    if name == "dots":
        return jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    raise ValueError(f"unknown remat policy {name!r} "
                     "(use True/'full', 'conv' or 'dots')")


class Trainer:
    """Builds the model/loss/optimizer from a TrainPlan and runs training."""

    def __init__(self, plan: TrainPlan, mesh=None, dtype=None,
                 steps_per_epoch: Optional[int] = None,
                 remat: Optional[bool] = None):
        setup_compile_cache()
        self.plan = plan
        self.mesh = mesh
        self.dtype = dtype or default_dtype()
        # jax.checkpoint over the forward: recompute activations in the
        # backward instead of saving them — trades MXU FLOPs (which have
        # headroom; the step is HBM-bandwidth-bound per the roofline in
        # README.md) for activation traffic. Plan key `remat` overrides.
        self.remat = plan.cfg.get("remat", False) if remat is None else remat
        # per-block BN+act tail checkpointing (layers.bn_tail_remat): cuts
        # the backward's saved-residual HBM traffic without recomputing
        # convs — unlike the whole-forward `remat` above. Plan key
        # `bn_remat`; orthogonal to (and composable with) `remat`.
        self.bn_remat = bool(plan.cfg.get("bn_remat", False))

        model_cfg = cvt_cfg(plan.model_cfg)
        self.spec = build_model_spec(model_cfg, plan.image_chan, plan.anchors,
                                     plan.num_labels, plan.anchors_mask)
        self.model = YoloModel(spec=self.spec, dtype=self.dtype,
                               bn_remat=self.bn_remat)
        self.nl = len(self.spec.strides)

        self.loss_cfg = LossConfig(
            num_classes=plan.num_labels,
            input_size=(plan.image_size, plan.image_size),
            strides=self.spec.strides,
            anchors=self.spec.anchors,
            max_gt=plan.max_boxes,
            fl_gamma=plan.focal_gamma,
            fl_alpha=plan.focal_alpha,
            iou_ratio=plan.iou_loss_ratio,
            threshold=plan.anchor_t,
        )
        self.optimizer = make_optimizer(plan)
        self.aug_cfg = aug_config_from_plan(plan)
        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    def init_state(self, rng) -> Dict[str, Any]:
        x = jnp.zeros((1, self.plan.image_size, self.plan.image_size,
                       self.plan.image_chan), jnp.float32)
        variables = self.model.init(rng, x, False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        ema = ema_init({"params": params, "batch_stats": batch_stats})
        return {"params": params, "batch_stats": batch_stats,
                "opt": opt_state, "ema": ema,
                "step": jnp.zeros((), jnp.int32)}

    def warm_start(self, src: str, state, log=print):
        """Weights-only warm start (``init_weights_from`` plan key): load
        params + batch_stats from a checkpoint and start a FRESH run
        (step 0, fresh optimizer/EMA/schedule) — pretrained init /
        fine-tuning, the counterpart of the reference's pretrained
        backbone download (nets/backbone.py:118-125) and of resuming a
        bare ``state_dict`` into a new schedule (train.py:38-39).
        Accepts an ours ``.msgpack`` checkpoint (EMA tree — the serving
        weights) or a torch ``.pth`` via the bit-parity-tested importer.
        """
        if src.endswith(".pth"):
            from ..tools.torch_import import load_torch_checkpoint
            params, batch_stats = load_torch_checkpoint(
                src, self.spec, state["params"], state["batch_stats"])
        else:
            loaded = try_load(src, state)
            if loaded is None:
                raise FileNotFoundError(f"init_weights_from: {src}")
            tree = loaded["ema"].tree
            params, batch_stats = tree["params"], tree["batch_stats"]
        log(f"warm start: weights from {src}")
        return dict(state, params=params, batch_stats=batch_stats,
                    ema=ema_init({"params": params,
                                  "batch_stats": batch_stats}))

    # ------------------------------------------------------------------
    def _split_heads(self, outs):
        if self.spec.head_name == "IAuxDetect":
            return outs[: self.nl], outs[self.nl:]
        return outs, ()

    def loss_from_outputs(self, outs, labels, lmask):
        lead, aux = self._split_heads(outs)
        if self.spec.head_name == "IBin":
            from ..losses.bin_loss import bin_yolo_loss
            return bin_yolo_loss(lead, labels, lmask, self.loss_cfg)
        return yolo_loss(lead, labels, lmask, self.loss_cfg, aux_preds=aux)

    # ------------------------------------------------------------------
    def train_step_fn(self, state, images, labels, lmask, lr_w, lr_b, mom):
        """Pure step function (to be jitted)."""
        labels_tree = label_params(state["params"])

        def fwd(params, batch_stats, images):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, True, mutable=["batch_stats"])

        if self.remat:
            fwd = jax.checkpoint(fwd, policy=remat_policy(self.remat))

        def loss_fn(params):
            outs, mut = fwd(params, state["batch_stats"], images)
            loss, parts = self.loss_from_outputs(outs, labels, lmask)
            return loss, (mut["batch_stats"], parts)

        (loss, (new_bs, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        hyper = StepHyper(lr_weights=lr_w, lr_bias=lr_b, momentum=mom)
        new_params, new_opt = self.optimizer.update(
            grads, state["opt"], state["params"], labels_tree, hyper)
        new_ema = ema_update(state["ema"],
                             {"params": new_params, "batch_stats": new_bs},
                             decay=self.plan.ema_decay, tau=self.plan.ema_tau)
        new_state = {"params": new_params, "batch_stats": new_bs,
                     "opt": new_opt, "ema": new_ema,
                     "step": state["step"] + 1}
        return new_state, {"loss": loss, **parts}

    def jitted_train_step(self):
        # sharding is carried by the input arrays (shard_params/shard_batch
        # place them on the mesh); GSPMD propagates through the jitted step
        # and inserts the ICI collectives.
        if "train_step" not in self._jit_cache:
            # `xla_opts` plan key: XLA debug options shipped inside the
            # compile request (e.g. {"xla_tpu_scoped_vmem_limit_kib":
            # 65536}). This is the only vehicle that reaches a REMOTE
            # TPU compiler — XLA_FLAGS is parsed (and unknown TPU flags
            # fatally rejected) by the local plugin before any request
            # leaves the host.
            opts = self.plan.cfg.get("xla_opts", None)
            kw = {"compiler_options": dict(opts)} if opts else {}
            self._jit_cache["train_step"] = jax.jit(
                self.train_step_fn, donate_argnums=(0,), **kw)
        return self._jit_cache["train_step"]

    def jitted_eval_loss(self):
        if "eval_loss" not in self._jit_cache:
            def fn(params, batch_stats, images, labels, lmask):
                outs = self.model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    images, False)
                loss, _ = self.loss_from_outputs(outs, labels, lmask)
                return loss
            self._jit_cache["eval_loss"] = jax.jit(fn)
        return self._jit_cache["eval_loss"]

    # ------------------------------------------------------------------
    def augment(self, rng, batch, train=True):
        tiles, metas, boxes, masks, mosaic, mixup = batch
        return augment_batch(
            rng, jnp.asarray(tiles), jnp.asarray(metas), jnp.asarray(boxes),
            jnp.asarray(masks), jnp.asarray(mosaic), jnp.asarray(mixup),
            cfg=self.aug_cfg, max_gt=self.plan.max_boxes, train=train)

    # ------------------------------------------------------------------
    def run(self, log=print):
        """Full training per the plan; mirrors train.py:54-121."""
        plan = self.plan
        train_ds = YoloDataset(
            load_annotation_file(plan.train_indexes), plan.image_size,
            plan.max_boxes, plan.mosaic, plan.mixup, plan.mosaic_prob,
            plan.mixup_prob, plan.epochs, plan.special_aug_ratio,
            train=True, seed=plan.seed, cache_images=plan.cache_images)
        val_ds = YoloDataset(
            load_annotation_file(plan.val_indexes), plan.image_size,
            plan.max_boxes, train=False, seed=plan.seed,
            cache_images=plan.cache_images)

        steps_per_epoch = max(len(train_ds) // plan.batch_size, 1)
        sched = LRSchedule(
            plan.learn_initial, plan.learn_final, plan.epochs, plan.decay,
            plan.momentum, plan.warmup, plan.warmup_epochs,
            plan.warmup_max_iter, plan.warmup_momentum, plan.warmup_bias_lr,
            steps_per_epoch)

        rng = jax.random.PRNGKey(plan.seed)
        rng, init_rng = jax.random.split(rng)
        state = self.init_state(init_rng)
        warm_src = plan.cfg.get("init_weights_from")
        if warm_src:
            state = self.warm_start(warm_src, state, log)

        # exact resume prefers the every-epoch 'last' checkpoint; the
        # best-loss checkpoint (reference parity, train.py:38-39) is the
        # fallback. SURVEY §5: the reference loses everything since the
        # last best-loss save on a crash.
        last_path = plan.save_path + ".last"
        ckpt = None
        if plan.resume:
            ckpt = try_load(last_path, state) or try_load(plan.save_path, state)
        if ckpt is not None:
            state = ckpt
            log(f"resumed at step {int(state['step'])}")

        step_fn = self.jitted_train_step()
        eval_fn = self.jitted_eval_loss()
        best_loss = math.inf
        best_map = -math.inf
        history = []

        # `device_cache` plan key: stage the whole train set once and
        # device_put it; each step then ships only (B, T) int32 tile
        # indices + flags instead of the pixel batch. Removes the
        # host->device pixel stream (HBM cost N*S*S*3 bytes — the
        # caller's responsibility to gate on dataset size) and with it
        # the tunnel's per-transfer host mirrors (see host_sync_every
        # note above).
        # RAM-safety default (round-4 verdict #5): through the TPU tunnel
        # the per-step pixel stream is mirrored in host RAM until process
        # exit (~1:1 bytes; a 60-epoch mosaic run OOM-killed a 125 GB
        # host), so the pool mode is ON by default whenever the staged
        # dataset fits the byte budget. Budget formula:
        #   pool_bytes = N * S * S * 3 (u8 canvases)
        #              + N * (max_boxes * 6 + 5) * 4 (boxes/masks/metas)
        # `device_cache: true/false` forces the mode;
        # `device_cache_budget_mb` (default 2048) gates the auto path and
        # guards an explicit opt-in on an oversized dataset.
        device_cache = plan.cfg.get("device_cache", None)
        budget_mb = float(plan.cfg.get("device_cache_budget_mb", 2048))
        n_img = len(train_ds)
        pool_mb = (n_img * plan.image_size ** 2 * 3
                   + n_img * (plan.max_boxes * 6 + 5) * 4) / 1e6
        if device_cache is None:
            device_cache = pool_mb <= budget_mb
            if device_cache:
                log(f"device cache auto-enabled ({pool_mb:.0f} MB pool <= "
                    f"{budget_mb:.0f} MB budget)")
        elif device_cache and pool_mb > budget_mb:
            log(f"WARNING: device_cache pool {pool_mb:.0f} MB exceeds the "
                f"{budget_mb:.0f} MB budget (device_cache_budget_mb) — "
                "staging proceeds because the plan forces device_cache; "
                "expect a matching host-RAM/HBM spike")
        pool = None
        if device_cache:
            t0 = time.time()
            pool = tuple(jnp.asarray(a) for a in train_ds.staged_pool())
            log(f"device cache: {pool[0].shape[0]} staged images -> device "
                f"({pool[0].nbytes / 1e6:.0f} MB, {time.time() - t0:.0f}s)")

        host_step = int(state["step"])
        # resume-semantics fix (round-4 verdict #4): restart the epoch
        # loop where the checkpointed step count left off — a resumed run
        # trains the REMAINING epochs (same mosaic/special_aug_ratio
        # window, same total epoch count as an uninterrupted run) instead
        # of replaying the full schedule. The lr schedule itself is
        # clamped at its final value (ops/schedules.py epoch_lr), fixing
        # the reference's negative-lr overrun
        # (main/learningrate_scheduler.py:44).
        epoch0 = min(host_step // steps_per_epoch, plan.epochs)
        # optional epoch cap (`stop_after_epoch` plan key): train only the
        # first E epochs of the plan.epochs schedule — the LR/mosaic
        # horizons stay at plan.epochs, exactly like a run interrupted at
        # epoch E. Used for budget-matched A/B pairings where the other
        # arm ran out of wall clock (scripts/northstar_ab.py).
        last_epoch = min(plan.epochs,
                         int(plan.cfg.get("stop_after_epoch") or plan.epochs))
        # per-step augmentation keys derive from (seed, host_step), not a
        # split chain, so resumed batches equal uninterrupted ones
        aug_base = jax.random.fold_in(rng, 0x617567)
        for epoch in range(epoch0, last_epoch):
            train_ds.reseed(epoch)
            t0 = time.time()
            losses, nsteps = [], 0
            hyper = sched(host_step)
            if device_cache:
                # index batches are a few hundred bytes — no prefetch
                # thread needed
                loader = train_ds.epoch_plans(plan.batch_size, plan.shuffle,
                                              plan.drop_last)
            else:
                loader = PrefetchLoader(
                    lambda: train_ds.epoch_batches(plan.batch_size,
                                                   plan.shuffle,
                                                   plan.drop_last))
            for batch in loader:
                hyper = sched(host_step)
                aug_rng = jax.random.fold_in(aug_base, host_step)
                if device_cache:
                    tile_idx, mosaic, mixup = batch
                    images, labels, lmask = augment_batch_from_pool(
                        aug_rng, *pool, jnp.asarray(tile_idx),
                        jnp.asarray(mosaic), jnp.asarray(mixup),
                        cfg=self.aug_cfg, max_gt=plan.max_boxes, train=True)
                else:
                    images, labels, lmask = self.augment(aug_rng, batch, True)
                state, metrics = step_fn(state, images, labels, lmask,
                                         hyper.lr_weights, hyper.lr_bias,
                                         hyper.momentum)
                # keep the loss on device; one host sync per epoch (each
                # transfer costs a full RTT through the TPU tunnel)
                losses.append(metrics["loss"])
                host_step += 1
                nsteps += 1
                # opt-in periodic host sync (`host_sync_every` plan key).
                # Through the tunnel, host RSS grows ~1:1 with the bytes
                # transferred host->device (a 60-epoch mosaic run reached
                # 130 GB and was OOM-killed at epoch 40). Measured: the
                # mirrors are NOT reclaimed even at sync points (plugin
                # frees them at process exit), so budget long-run RAM as
                # total input bytes — this knob only bounds in-flight
                # async work (useful pacing/diagnostics, ~100 ms per
                # sync), it does not cap the growth.
                if (self.plan.cfg.get("host_sync_every", 0)
                        and nsteps % self.plan.cfg["host_sync_every"] == 0):
                    jax.block_until_ready(metrics["loss"])
                    gc.collect()
            mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
            history.append(mean_loss)
            ips = nsteps * plan.batch_size / max(time.time() - t0, 1e-9)
            # hyper is the last step's hyper: the lr actually used this
            # epoch (evaluating sched(host_step) here would show the NEXT
            # epoch's lr — and past the final epoch the reference's own
            # linear lambda goes negative, learningrate_scheduler.py:44)
            log(f"epoch {epoch + 1}/{plan.epochs} loss {mean_loss:.4f} "
                f"lr {hyper.lr_weights:.6f} {ips:.1f} img/s")

            save_checkpoint(last_path, state)  # crash-safe step-level resume

            # best-train-loss gate -> val pass + save (train.py:103-120)
            if mean_loss <= min(history):
                val_losses = []
                for batch in val_ds.epoch_batches(plan.batch_size, False, False):
                    images, labels, lmask = self.augment(rng, batch, False)
                    val_losses.append(eval_fn(state["params"],
                                              state["batch_stats"],
                                              images, labels, lmask))
                val_mean = float(jnp.mean(jnp.stack(val_losses))) \
                    if val_losses else 0.0
                save_checkpoint(plan.save_path, state)
                log(f"epoch {epoch + 1} new best {mean_loss:.4f} "
                    f"(val {val_mean:.4f}) -> {plan.save_path}")

            # mAP-gated validation on the EMA weights (val_map_every plan
            # key; new capability — the reference validates loss only)
            if plan.val_map_every and (epoch + 1) % plan.val_map_every == 0:
                summary = self.validate_map(state, log=lambda *_: None)
                m = summary.get("mAP@0.5:0.95", 0.0)
                line = f"epoch {epoch + 1} val mAP@0.5:0.95 {m:.4f}"
                if m > best_map:
                    best_map = m
                    save_checkpoint(plan.save_path + ".bestmap", state)
                    line += f" (best) -> {plan.save_path}.bestmap"
                log(line)
        return state

    def validate_map(self, state, log=print, **kw) -> dict:
        """mAP evaluation of the current EMA weights over plan.val_indexes."""
        from ..detect_api import Detector
        from ..eval.validate import validate
        ema_tree = state["ema"].tree
        det = Detector(self.plan, dtype=self.dtype,
                       params=ema_tree["params"],
                       batch_stats=ema_tree["batch_stats"])
        return validate(self.plan, detector=det, log=log, **kw)


def train(train_cfg_file: str, verbose: bool = False, **kw):
    """Public API mirroring ``train.py:23``. ``verbose`` prints the
    per-layer param table (the Model.print_info surface,
    nets/yolo.py:127-141)."""
    plan = TrainPlan(train_cfg_file)
    trainer = Trainer(plan, **kw)
    if verbose:
        from ..nn.builder import format_model_info
        state = trainer.init_state(jax.random.PRNGKey(plan.seed))
        print(format_model_info(trainer.spec, state["params"],
                                plan.image_size, model=trainer.model))
    return trainer.run()
