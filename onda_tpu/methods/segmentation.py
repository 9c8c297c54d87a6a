"""Supervised source pretraining (SEGMENT mode).

Reference: framework/domain_adaptation/methods/segmentation.py:18-151 — per batch
forward → interp to input res → CE(main) + 0.1·CE(aux) → SGD with poly LR; per
epoch full validation (mIoU + mean entropy, optional original-res IoU), sample
images, checkpoint. The train step here is one jitted function with a built-in
stage throughput meter (the reference times stages with CUDA events,
monitoring.py:139-161 — SURVEY.md §5.1).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import unset
from ..ops import losses as L
from ..ops import metrics as M
from ..ops.interp import upsample_bilinear_ac
from . import optim
from .timing import SpeedMeter


class SegmentTrainer:
    def __init__(self, model, variables, cfg, cfg_spec, num_classes: int, logger=None):
        self.model = model
        self.cfg = cfg
        self.spec = cfg_spec
        self.num_classes = num_classes
        self.logger = logger
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.momentum_buf = jax.tree.map(jnp.zeros_like, self.params)
        self.labels_tree = optim.label_params(self.params, aux_grad=bool(model.multi_level))
        self.rng = jax.random.key(int(cfg.TRAINING.RANDOM_SEED))
        self._step = None
        self._eval = None
        # data-parallel mesh: replicated train state, batch-sharded inputs
        from ..config import unset as _unset
        from ..parallel.mesh import data_parallel_setup

        (self.mesh, self._place,
         (self.params, self.batch_stats, self.momentum_buf)) = data_parallel_setup(
            None if _unset(cfg.OTHERS.DATA_PARALLEL) else cfg.OTHERS.DATA_PARALLEL,
            int(cfg.TRAINING.BATCH_SIZE),
            (self.params, self.batch_stats, self.momentum_buf),
            tensor_parallel=None if _unset(cfg.OTHERS.TENSOR_PARALLEL)
            else cfg.OTHERS.TENSOR_PARALLEL,
        )

    @property
    def resolution_hw(self):
        w, h = self.cfg.SCHEME.RESOLUTION
        return int(h), int(w)

    def _build_step(self):
        model, out_hw = self.model, self.resolution_hw
        momentum = float(self.spec.MOMENTUM)
        wd = float(self.spec.WEIGHT_DECAY)
        labels_tree = self.labels_tree

        def step(params, stats, mom, rng, images, labels, lr):
            rng, r_d = jax.random.split(rng)

            def loss_fn(p):
                (aux, main), mut = model.apply(
                    {"params": p, "batch_stats": stats}, images, train=True,
                    update_stats=True, dropout_rng=r_d, mutable=["batch_stats"],
                )
                pick = lambda o: o["out"] if isinstance(o, dict) else o
                loss = L.cross_entropy_2d(upsample_bilinear_ac(pick(main), out_hw), labels)
                if aux is not None:
                    loss = loss + 0.1 * L.cross_entropy_2d(
                        upsample_bilinear_ac(pick(aux), out_hw), labels
                    )
                return loss, mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_params, new_mom = optim.update(
                params, grads, mom, labels_tree, lr, lr * 10.0, momentum, wd
            )
            return new_params, new_stats, new_mom, rng, loss

        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _build_eval(self, out_hw=None):
        model, C = self.model, self.num_classes
        out_hw = out_hw or self.resolution_hw

        def eval_step(params, stats, images, labels, hist, ent_sum):
            _, main = model.apply({"params": params, "batch_stats": stats}, images, train=False)
            out = main["out"] if isinstance(main, dict) else main
            probs = jax.nn.softmax(upsample_bilinear_ac(out.astype(jnp.float32), out_hw), axis=-1)
            hist = hist + M.fast_hist(labels.astype(jnp.int32), probs.argmax(-1), C)
            return hist, ent_sum + M.mean_entropy(probs)

        return jax.jit(eval_step)

    def evaluate(self, loader, original_res: bool = False):
        """Per-class IoU + mean entropy; with `original_res`, also IoU at the
        dataset's native resolution via `label_raw` (reference
        eval_UDA.evaluate_model, eval_UDA.py:21-74)."""
        if self._eval is None:
            self._eval = self._build_eval()
        eval_org = None
        if original_res and not unset(self.cfg.SCHEME.ORIGINAL_RES):
            w, h = self.cfg.SCHEME.ORIGINAL_RES
            eval_org = self._build_eval(out_hw=(int(h), int(w)))
        hist = jnp.zeros((self.num_classes, self.num_classes), jnp.int32)
        hist_org = jnp.zeros((self.num_classes, self.num_classes), jnp.int32)
        ent = jnp.zeros(())
        n = 0
        saw_raw = False
        for batch in loader:
            labels = np.asarray(batch["label"], np.int32)
            valid = batch.get("valid", len(labels))
            if valid < len(labels):
                labels = labels.copy()
                labels[valid:] = 255
            hist, ent = self._eval(
                self.params, self.batch_stats, self._place(batch["image"]),
                self._place(labels), hist, ent,
            )
            if eval_org is not None and "label_raw" in batch:
                saw_raw = True
                raw = np.asarray(batch["label_raw"], np.int32)
                if valid < len(raw):
                    raw = raw.copy()
                    raw[valid:] = 255
                hist_org, _ = eval_org(
                    self.params, self.batch_stats, self._place(batch["image"]),
                    self._place(raw), hist_org, jnp.zeros(()),
                )
            n += 1
        iou = M.per_class_iu(np.asarray(hist))
        if eval_org is not None and saw_raw:
            # only report the full-image score when the dataset actually
            # carried label_raw (the driver omits it when ORIGINAL_RES equals
            # RESOLUTION) — an all-zero histogram would log a bogus 0.0 mIoU
            return iou, float(ent) / max(n, 1), M.per_class_iu(np.asarray(hist_org))
        return iou, float(ent) / max(n, 1)

    def train(self, train_loaders: dict, validation_loaders: dict) -> None:
        if self._step is None:
            self._step = self._build_step()
        loader = next(iter(train_loaders.values()))
        epochs = int(self.spec.EPOCHS)
        base_lr = float(self.spec.LEARNING_RATE)
        power = float(self.spec.POWER)
        total = max(len(loader) * epochs, 1)
        meter = SpeedMeter(enabled=not unset(self.cfg.OTHERS.SCHEDULE) and bool(self.cfg.OTHERS.SCHEDULE))
        step_i = 0
        window = []  # losses since the last log (reference `avrg`)
        for epoch in range(epochs):
            for batch in loader:
                meter.mark("Batch Fetch")
                # the reference adjusts the poly LR AFTER optimizer.step()
                # (segmentation.py:83-88), so step i trains at lr(i-1) — step 0
                # at the construction lr — while the LOGGED rate is lr(i)
                lr = (base_lr * (1.0 - max(step_i - 1, 0) / total) ** power
                      if power else base_lr)
                self.params, self.batch_stats, self.momentum_buf, self.rng, loss = self._step(
                    self.params, self.batch_stats, self.momentum_buf, self.rng,
                    self._place(batch["image"]),
                    self._place(np.asarray(batch["label"], np.int32)),
                    jnp.asarray(lr, jnp.float32),
                )
                meter.mark("Fused Step (fwd+loss+bwd+update)")
                window.append(float(loss))
                if step_i % 10 == 0:
                    # reference logs the MEAN of the window since the last log
                    # and the post-adjust rate (segmentation.py:89-97)
                    lr_logged = (base_lr * (1.0 - step_i / total) ** power
                                 if power else base_lr)
                    self._log({"Segmentation loss": sum(window) / len(window),
                               "learning_rate": lr_logged, **meter.averages()})
                    window = []
                step_i += 1
            log = {"epoch": epoch}
            original = not unset(self.cfg.SCHEME.ORIGINAL_RES)
            for set_, val_loader in validation_loaders.items():
                result = self.evaluate(val_loader, original_res=original)
                iu, ent = result[0], result[1]
                log[f"Val mIoU of {set_}"] = float(np.nanmean(iu))
                log[f"Val std IoU of {set_}"] = float(np.nanstd(iu))
                log[f"val entropy of {set_}"] = ent
                if len(result) == 3:
                    log[f"Val mIoU full image of {set_}"] = float(np.nanmean(result[2]))
            self._log(log)
            self.save_model()

    def save_model(self) -> None:
        from ..utils import checkpoint as ckpt

        root = self.cfg.OTHERS.SNAPSHOT_DIR
        os.makedirs(root, exist_ok=True)
        from ..config import value_or

        name = f"model_train_{self.cfg.SCHEME.SOURCE}"
        ckpt.save_state({"params": self.params, "batch_stats": self.batch_stats}, root,
                        name=name,
                        wait=not bool(value_or(self.cfg.OTHERS.ASYNC_SAVE, False)))
        # the reference's per-epoch artifact is a torch .pth of the same name
        # (segmentation.py:141-151 save_model) — write it too, so a reference
        # user finds the file their tooling expects; skipped without torch
        if jax.process_index() == 0:
            try:
                from ..models.import_torch import save_torch_checkpoint

                save_torch_checkpoint(
                    {"params": self.params, "batch_stats": self.batch_stats},
                    os.path.join(root, name + ".pth"))
            except ImportError:
                pass

    def _log(self, metrics):
        if self.logger is not None:
            self.logger.log(metrics)
