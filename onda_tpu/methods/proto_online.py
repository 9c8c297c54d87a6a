"""Online prototype-based adaptation — ONE jitted TPU step.

The reference's hot loop is 4-5 separate torch forwards + 2 backwards + a Python
prototype kernel per streamed batch (SURVEY.md §3.2, reference
methods/prototypes.py:418-450,466-520). Here the entire adapt-then-predict step —

    student source-replay forward, student target forward (+grad), EMA/static
    teacher forwards, the lax.cond-gated dynamic forward, monitor updates, the
    switch policy, prototype distance → pseudo-label fusion, all losses, the SGD
    update, prototype EMA and model EMA

— is a single traced function `state, batches → state', logs`. Under a
data-parallel `jax.sharding.Mesh` the batch axis is sharded and GSPMD inserts the
gradient / prototype-moment / confidence all-reduces automatically (SURVEY.md
§5.8): prototype moments are order-independent per-class sums, so every replica
holds identical prototypes after each step.

Method semantics (fidelity checklist, SURVEY.md §7.4):
* pseudo-labels use the EMA model's features + a policy-mixed teacher prior
  (reference prototypes.py:208-273 and the three switch subclasses);
* the hard labels use the pre-drift tau while soft predictions use the
  incremented tau (the reference increments tau between the two
  `pseudo_labels` calls, prototype_handler.py:148-156);
* BN policies freeze/double/keep around the source-replay pass
  (reference prototypes.py:427-440);
* EMA update runs after the optimizer step and copies BN buffers verbatim
  (reference prototypes.py:407-416, train loop :506-508);
* losses computed at the 1/8+1 output grid, no upsampling in the training path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import unset, value_or
from ..ops import losses as L
from ..ops import metrics as M
from ..ops import prototypes as P
from ..ops.interp import resize_nearest, upsample_bilinear_ac
from ..ops.monitor import Monitor
from . import optim
from .prior_policy import POLICY_BY_METHOD, compute_prior
from .state import AdaptState, make_adapt_state
from .timing import SpeedMeter, samples_due

MONITOR_KEYS = (
    "model",
    "prior EMA",
    "prior static",
    "prior dynamic",
    "prior",
    "prototypes",
    "tau",
    "pseudolabel confidence",
    "percentage_static",
)

NUM_FEATURES = 256  # ProDA classifier feature width (reference deeplabv2.py:205)


def dump_logits_batch(base: str, index: int, logits_nhwc) -> None:
    """Write one prediction batch the way the reference's consumers read it:
    an NCHW torch tensor at `<base>/batch-{i}.pt` (reference
    adaptation_model.py:218-232); .npy fallback when torch is unavailable."""
    logits_nchw = np.asarray(logits_nhwc).transpose(0, 3, 1, 2)
    try:
        import torch
    except Exception:
        torch = None
    if torch is not None:
        torch.save(torch.from_numpy(logits_nchw.copy()),
                   os.path.join(base, f"batch-{index}.pt"))
    else:
        # Consumer-visible format change — make it impossible to miss.
        import warnings

        warnings.warn(
            "PREDICTION_SAVE: torch is unavailable, writing batch-{i}.npy "
            "(numpy NCHW) instead of the reference's torch batch-{i}.pt — "
            "downstream consumers expecting .pt files will not find them",
            RuntimeWarning,
            stacklevel=2,
        )
        np.save(os.path.join(base, f"batch-{index}.npy"), logits_nchw)


def _softmax(x):
    # always in f32: bf16 model outputs feed f32 probability math
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1)


def _conf(p):
    """Mean max-softmax confidence — the monitored signal (reference prototypes.py:215)."""
    return p.max(axis=-1).mean()


class ProtoOnlineAdapter:
    """Host-side engine: owns the AdaptState, jitted step/eval functions and the
    reference-compatible train loop (cadence: per-step logging, per-epoch
    cross-domain evaluation + checkpoint, reference prototypes.py:466-520)."""

    def __init__(self, model, variables, cfg, cfg_spec, num_classes: int, logger=None):
        self.model = model
        self.cfg = cfg
        self.cfg_spec = cfg_spec
        self.num_classes = num_classes
        self.logger = logger
        self.policy = POLICY_BY_METHOD.get(cfg.METHOD.ADAPTATION.NAME, "base")

        mon_args = {}
        if not unset(cfg_spec.EXP_MONITOR_CONST):
            mon_args["exp_const"] = float(cfg_spec.EXP_MONITOR_CONST)
        if not unset(cfg_spec.DEV_MONITOR_FUNC):
            mon_args["dev_func"] = cfg_spec.DEV_MONITOR_FUNC
        self.monitor = Monitor(MONITOR_KEYS, limit=int(cfg_spec.AVG_MONITOR_SIZE), **mon_args)

        proto = P.init_state(num_classes, NUM_FEATURES, tau=float(cfg_spec.TAU))
        self.skip_proto = False
        if isinstance(cfg_spec.LOAD_PROTO, str):
            proto, loaded = P.load(proto, cfg_spec.LOAD_PROTO)
            self.skip_proto = loaded
            if loaded:
                print("Prototypes loaded!")
        self.state = make_adapt_state(
            variables, proto, self.monitor.init(), seed=int(cfg.TRAINING.RANDOM_SEED)
        )
        # data-parallel mesh (cfg.OTHERS.DATA_PARALLEL: auto when >1 device):
        # state replicated, batch axes sharded; GSPMD inserts the gradient /
        # prototype-moment / confidence all-reduces (SURVEY.md §2.16, §5.8)
        from ..parallel.mesh import data_parallel_setup

        self.mesh, self._place, self.state = data_parallel_setup(
            None if unset(cfg.OTHERS.DATA_PARALLEL) else cfg.OTHERS.DATA_PARALLEL,
            int(cfg.TRAINING.BATCH_SIZE), self.state,
            tensor_parallel=None if unset(cfg.OTHERS.TENSOR_PARALLEL)
            else cfg.OTHERS.TENSOR_PARALLEL,
        )
        self.param_labels = optim.label_params(self.state.params, aux_grad=bool(model.multi_level))
        self.lr_ratios = self._lr_ratios()
        self.dynamic_update_counter = 0
        self._step_cache = {}
        self._eval_cache = {}
        self._applied_spec = self._trace_relevant_spec(cfg_spec)
        self._copy_dynamic = jax.jit(
            lambda s: s.replace(
                dynamic_params=s.params, dynamic_batch_stats=s.batch_stats
            ),
            donate_argnums=0,
        )
        self.prediction_counter = {}
        self.conf_reg_thresh = (
            1.0
            if unset(cfg_spec.CONFIDENCE_REGULARIZATION_THRESHOLD)
            else float(cfg_spec.CONFIDENCE_REGULARIZATION_THRESHOLD)
        )
        self.ece_record = not (
            isinstance(cfg.OTHERS.ECE_SKIP, bool) and cfg.OTHERS.ECE_SKIP
        )
        if not unset(cfg_spec.LOAD_MODEL) and cfg_spec.LOAD_MODEL:
            self.load_model(cfg_spec.LOAD_MODEL)

    # ------------------------------------------------------------------
    # configuration plumbing
    # ------------------------------------------------------------------
    def _lr_ratios(self):
        ratio = self.cfg.MODEL.LR_RATIO
        if ratio is None or unset(ratio):
            ratio = "1:10"
        r0, r1 = (int(v) for v in ratio.split(":"))
        return float(r0), float(r1)

    # spec keys the traced step never reads (set_/SKIP_CALC change every
    # domain; EPOCHS only sizes the host loop) — they must NOT invalidate the
    # compiled executables (CLAUDE.md invariant: domain changes that only swap
    # data do not retrace)
    _HOST_ONLY_SPEC_KEYS = ("set_", "SKIP_CALC", "EPOCHS")

    @classmethod
    def _trace_relevant_spec(cls, spec):
        import copy

        return copy.deepcopy(
            {k: v for k, v in dict(spec).items() if k not in cls._HOST_ONLY_SPEC_KEYS}
        )

    def update_cfg_spec(self, new_spec):
        """Per-domain cfg overrides (reference train_ouda.py:248-260). Changed
        values invalidate the traced steps (they are compile-time constants);
        the CLI mutates the SAME spec object per domain, so comparison is
        against a snapshot of what was last applied — a domain change that only
        swaps `set_`/SKIP_CALC/data reuses every cached executable."""
        snap = self._trace_relevant_spec(new_spec)
        changed = snap != getattr(self, "_applied_spec", None)
        self.cfg_spec = new_spec
        self._applied_spec = snap
        self.lr_ratios = self._lr_ratios()
        if changed:
            self._invalidate_step_caches()

    def _invalidate_step_caches(self):
        self._step_cache.clear()
        self._eval_cache.clear()

    @property
    def resolution_hw(self):
        w, h = self.cfg.SCHEME.RESOLUTION
        return int(h), int(w)

    # ------------------------------------------------------------------
    # the fused step
    # ------------------------------------------------------------------
    def _build_step(self, have_src: bool, source_repeat: int, want_soft: bool,
                    want_pred: bool = False):
        spec = self.cfg_spec
        model, monitor, policy = self.model, self.monitor, self.policy
        C = self.num_classes
        metric = spec.DISTANCE_MEASURE
        ma_lambda = float(spec.MA_LAMBDA)
        pseudo_thresh = float(spec.PSEUDO_THRESH)
        soft_labels = bool(value_or(spec.SOFT_LABELS, False))
        rce_alpha = float(spec.RCE_ALPHA)
        rce_beta = float(spec.RCE_BETA)
        reg_weight = float(spec.REGULARIZER_WEIGHT)
        regularizer = spec.REGULARIZER
        js_d = float(spec.JS_D)
        model_reg = float(value_or(spec.MODEL_REGULARIZATION, 0.0))
        buff_ce_w = float(spec.BUFF_CE)
        buff_rce_w = float(spec.BUFF_RCE)
        bn_policy = spec.BN_POLICY if spec.BN_POLICY in ("freeze", "double", "keep") else "freeze"
        momentum = float(spec.MOMENTUM)
        weight_decay = float(spec.WEIGHT_DECAY)
        ema_update = float(spec.EMA_UPDATE)
        static_on = float(spec.STATIC_LAMBDA) > 0
        conf_reg_thresh = self.conf_reg_thresh
        labels = self.param_labels
        r0, r1 = self.lr_ratios

        def apply_eval(params, stats, images):
            _, main = model.apply({"params": params, "batch_stats": stats}, images, train=False)
            return main

        # Merge the student source-replay and target forwards into ONE vmapped
        # gradient pass (slices on a leading axis; BN reduces per slice, so the
        # per-pass batch statistics are exactly the sequential ones). Measured on
        # one v5e chip at batch 4: the two separate grads cost 314 ms, the merged
        # grad 142 ms — the backward has large fixed overhead at small batch.
        # Exactness: under `freeze` the source slices' stat updates are discarded
        # (reference stops BN updates during source batches); under `double` the
        # source slice starts from the alt collection and its update becomes the
        # new alt stats — both identical to the sequential schedule when the
        # source slices are mutually independent (always for freeze; R==1 for
        # double). `keep` (sequential stat composition) stays on the fallback.
        merge_src = (
            have_src
            and bn_policy in ("freeze", "double")
            and (bn_policy == "freeze" or source_repeat == 1)
            and os.environ.get("ONDA_MERGE_SRC_TRG", "1") != "0"
        )
        # The merged pass has two formulations with identical math:
        #   unroll — per-slice forwards inside ONE loss/backward (default);
        #   vmap   — slices batched onto a leading axis so every conv runs once
        #            at (S·B). vmap is bit-equal to unroll on 1-D (pure DP)
        #            meshes and on ("data","model") TP meshes, but a GSPMD
        #            bug (jax 0.9.0) multiplies the conv weight grads of a
        #            vmapped chain by the data-axis SIZE whenever the input is
        #            sharded over BOTH a batch and a spatial mesh axis — see
        #            tools/repro_vmap_spatial_grad.py. Measured equal-speed on
        #            the real v5e chip, so the correct-everywhere unroll is the
        #            default and vmap stays as an opt-in microbench reference.
        merge_vmap = os.environ.get("ONDA_MERGE_STYLE", "unroll") == "vmap"

        def step(state: AdaptState, trg_images, src_images, src_labels, lr_base):
            rng, r_ema, r_trg, *r_src = jax.random.split(state.rng, 3 + source_repeat)
            mon = state.monitor

            # ---- teacher forwards (no grad) -------------------------------
            _, ema_main = model.apply(
                {"params": state.ema_params, "batch_stats": state.batch_stats},
                trg_images, train=True, update_stats=False, dropout_rng=r_ema,
            )
            prior_ema = _softmax(ema_main["out"])
            mon = monitor.add(mon, "prior EMA", _conf(prior_ema))
            prior_static = None
            if static_on:
                static_main = apply_eval(state.static_params, state.static_batch_stats, trg_images)
                prior_static = _softmax(static_main["out"])
                mon = monitor.add(mon, "prior static", _conf(prior_static))

            def dyn_forward():
                main = apply_eval(state.dynamic_params, state.dynamic_batch_stats, trg_images)
                return _softmax(main["out"])

            prior, dyn_p, calc_dyn, switch, plogs = compute_prior(
                policy, spec, monitor, mon, state.switch, prior_ema, prior_static,
                dyn_forward, frozen=jnp.asarray(False),
            )
            if "percentage_static" in plogs:
                mon = monitor.add(mon, "percentage_static", plogs["percentage_static"])
            mon = monitor.add(mon, "prior dynamic", _conf(dyn_p), enable=calc_dyn)
            mon = monitor.add(mon, "prior", _conf(prior))

            # ---- prototype pseudo-labels ---------------------------------
            b, hh, ww, _ = prior_ema.shape
            feat = ema_main["feat"].reshape(-1, NUM_FEATURES).astype(jnp.float32)
            dis = P.distances(feat, state.proto, metric)
            prop = P.proto_probs(dis, state.proto.tau)
            mon = monitor.add(mon, "prototypes", _conf(prop))
            tau_bump = monitor.avg(mon, "prototypes") > conf_reg_thresh
            new_tau = state.proto.tau + 0.001 * tau_bump.astype(jnp.float32)
            mon = monitor.add(mon, "tau", new_tau, enable=tau_bump)
            prior_flat = prior.reshape(-1, C)
            fused_old_tau = P.fuse_prior(prop, prior_flat)
            pseudolabels = P.hard_labels(fused_old_tau, pseudo_thresh).reshape(b, hh, ww)
            soft_predictions = P.fuse_prior(P.proto_probs(dis, new_tau), prior_flat)
            mon = monitor.add(mon, "pseudolabel confidence", _conf(soft_predictions))
            soft_nhwc = soft_predictions.reshape(b, hh, ww, C)

            # ---- prototype EMA (order-independent sums → DP-safe) --------
            onehot = P.onehot_assign(ema_main["out"].reshape(-1, C).astype(jnp.float32))
            vect, sq, sums = P.class_moments(feat, onehot)
            proto = P.ma(state.proto.replace(tau=new_tau), vect, sq, sums, ma_lambda)

            # ---- student losses + grads ----------------------------------
            trg_target = soft_nhwc if soft_labels else pseudolabels

            def loss_fn(params):
                stats_main, stats_alt = state.batch_stats, state.alt_batch_stats
                # the objective sums buff losses over SOURCE_REPEAT (the
                # reference calls .backward() per source batch, accumulating
                # grads — prototypes.py:431-436), but its LOGGED dict is
                # overwritten each iteration, so wandb shows only the LAST
                # repeat's values; *_last reproduces that key semantics
                buff_ce = buff_ce_last = jnp.zeros(())
                buff_rce = buff_rce_last = jnp.zeros(())
                if merge_src:
                    src_base = stats_alt if bn_policy == "double" else stats_main

                    def fwd_slice(x, stats, key):
                        (_, main), mut = model.apply(
                            {"params": params, "batch_stats": stats}, x,
                            train=True, update_stats=True, dropout_rng=key,
                            mutable=["batch_stats"],
                        )
                        return main["out"], mut["batch_stats"]

                    if merge_vmap:
                        xs = jnp.concatenate([src_images, trg_images[None]], axis=0)
                        stats_in = jax.tree.map(
                            lambda a, m: jnp.stack([a] * source_repeat + [m]),
                            src_base, stats_main,
                        )
                        keys = jnp.stack([*r_src, r_trg])
                        outs, muts = jax.vmap(fwd_slice)(xs, stats_in, keys)
                        outs = [outs[s].astype(jnp.float32)
                                for s in range(source_repeat + 1)]
                        stats_main = jax.tree.map(lambda t: t[-1], muts)
                        if bn_policy == "double":
                            stats_alt = jax.tree.map(lambda t: t[0], muts)
                    else:
                        # per-slice forwards in ONE backward: under `freeze`
                        # the source slices' stat updates are discarded; under
                        # `double` the (single) source slice's update becomes
                        # the new alt stats — same semantics as the vmap form
                        pairs = [
                            fwd_slice(src_images[s], src_base, r_src[s])
                            for s in range(source_repeat)
                        ]
                        pairs.append(fwd_slice(trg_images, stats_main, r_trg))
                        outs = [o.astype(jnp.float32) for o, _ in pairs]
                        stats_main = pairs[-1][1]
                        if bn_policy == "double":
                            stats_alt = pairs[0][1]
                    for s in range(source_repeat):
                        if buff_ce_w > 0:
                            buff_ce_last = L.cross_entropy_2d(outs[s], src_labels[s])
                            buff_ce = buff_ce + buff_ce_last
                        if buff_rce_w > 0:
                            buff_rce_last = L.rce(outs[s], src_labels[s])
                            buff_rce = buff_rce + buff_rce_last
                    out_t = outs[-1]
                else:
                    def apply_frozen(p, stats, x, key):
                        _, main = model.apply(
                            {"params": p, "batch_stats": stats}, x,
                            train=True, update_stats=False, dropout_rng=key,
                        )
                        return main["out"]

                    def apply_updating(p, stats, x, key):
                        (_, main), mut = model.apply(
                            {"params": p, "batch_stats": stats}, x,
                            train=True, update_stats=True, dropout_rng=key,
                            mutable=["batch_stats"],
                        )
                        return main["out"], mut["batch_stats"]

                    if have_src:
                        for s in range(source_repeat):
                            stats_in = stats_alt if bn_policy == "double" else stats_main
                            if bn_policy == "freeze":
                                out_s = apply_frozen(params, stats_in, src_images[s], r_src[s])
                            else:
                                out_s, new_stats = apply_updating(
                                    params, stats_in, src_images[s], r_src[s]
                                )
                                if bn_policy == "double":
                                    stats_alt = new_stats
                                else:
                                    stats_main = new_stats
                            out_s = out_s.astype(jnp.float32)
                            if buff_ce_w > 0:
                                buff_ce_last = L.cross_entropy_2d(out_s, src_labels[s])
                                buff_ce = buff_ce + buff_ce_last
                            if buff_rce_w > 0:
                                buff_rce_last = L.rce(out_s, src_labels[s])
                                buff_rce = buff_rce + buff_rce_last
                    out_t, stats_main = apply_updating(
                        params, stats_main, trg_images, r_trg
                    )
                    out_t = out_t.astype(jnp.float32)
                ce = L.cross_entropy_2d(out_t, trg_target, soft=soft_labels) if rce_alpha > 0 else jnp.zeros(())
                rce_l = L.rce(out_t, trg_target, soft=soft_labels) if rce_beta > 0 else jnp.zeros(())
                sym = rce_alpha * ce + rce_beta * rce_l
                reg = L.regular_loss(regularizer, out_t) if reg_weight > 0 else jnp.zeros(())
                js = L.js_divergence(out_t, pseudolabels) if js_d > 0 else jnp.zeros(())
                mreg = (
                    L.ewc_loss(model_reg, state.static_params, params)
                    if model_reg > 0
                    else jnp.zeros(())
                )
                total_t = sym + reg_weight * reg + js_d * js + mreg
                buff_total = buff_ce_w * buff_ce + buff_rce_w * buff_rce
                aux = {
                    "stats_main": stats_main,
                    "stats_alt": stats_alt,
                    "out_t": out_t,
                    "logs": {
                        "ce_loss": ce, "rce_loss": rce_l, "sym_loss": sym,
                        "regularization_loss": reg, "JS Divergance loss": js,
                        "Total target loss": total_t, "model regularization": mreg,
                        # logged buff values are the LAST source batch's (the
                        # reference overwrites its log dict per repeat) while
                        # the objective sums over all repeats
                        "buff_ce_loss": buff_ce_last, "buff_rce_loss": buff_rce_last,
                        "buff_loss": buff_ce_w * buff_ce_last + buff_rce_w * buff_rce_last,
                    },
                }
                return total_t + buff_total, aux

            grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
            out_t = jax.lax.stop_gradient(aux["out_t"])
            mon = monitor.add(mon, "model", _conf(_softmax(out_t)))

            # ---- SGD + EMA ------------------------------------------------
            new_params, new_mom = optim.update(
                state.params, grads, state.opt_momentum, labels,
                lr_base * r0, lr_base * r1, momentum, weight_decay,
            )
            new_ema = jax.tree.map(
                lambda e, p: ema_update * e + (1.0 - ema_update) * p,
                state.ema_params, new_params,
            )

            logs = dict(aux["logs"])
            logs["pseudolabel_pixel_num"] = (
                ((pseudolabels >= 0) & (pseudolabels != 255)).astype(jnp.float32).sum()
            )
            logs["output & prototype agreement"] = (
                (pseudolabels == out_t.argmax(axis=-1)).astype(jnp.float32).mean()
            )
            logs["mean_prototype_intensity_values"] = (proto.mean**2).mean()
            logs["encoder_lr"] = lr_base * r0
            # whether the lax.cond-gated dynamic-teacher forward executed this
            # step (TPU addition, no reference analog): observability for the
            # switch policies, and bench.py's measured blend weight between
            # the steady-state and hot-path analytic FLOP counts
            logs["dynamic forward fired"] = calc_dyn.astype(jnp.float32)
            for key in MONITOR_KEYS:
                logs[f"{key} confidence ma"] = monitor.avg(mon, key)
                logs[f"{key} exp confidence ma"] = monitor.exp_avg(mon, key)
            logs["dev avg prior static"] = monitor.dev_avg(mon, "prior static")
            if want_soft:
                logs["soft_predictions"] = soft_nhwc
            if want_pred:  # PREDICTION_SAVE: stream raw target logits to host
                logs["target_logits"] = out_t

            new_state = state.replace(
                params=new_params,
                batch_stats=aux["stats_main"],
                alt_batch_stats=aux["stats_alt"],
                opt_momentum=new_mom,
                ema_params=new_ema,
                proto=proto,
                monitor=mon,
                switch=switch,
                rng=rng,
                step=state.step + 1,
            )
            return new_state, logs

        # scalar logs leave the device as ONE packed f32 vector, unpacked
        # lazily on the host — a single (deferred) D2H instead of ~40 per-key
        # syncs, each a full round trip over a tunneled chip
        from .logs_util import packed_jit

        return packed_jit(step, donate_argnums=0)

    def step_fn(self, have_src: bool, source_repeat: int, want_soft: bool,
                want_pred: bool = False):
        key = (have_src, source_repeat, want_soft, want_pred)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(
                have_src, source_repeat, want_soft, want_pred
            )
        return self._step_cache[key]

    # ------------------------------------------------------------------
    # prototype bootstrap (reference calculate_prototypes, prototypes.py:128-155)
    # ------------------------------------------------------------------
    def _build_bootstrap(self, from_source_labels: bool):
        model, C = self.model, self.num_classes

        def boot(state: AdaptState, images, labels_or_zero, valid):
            rng, r_d = jax.random.split(state.rng)
            # model stays in train mode with BN updates frozen (reference
            # prototypes.py:473-478) — batch-stat normalization + live dropout
            _, main = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                images, train=True, update_stats=False, dropout_rng=r_d,
            )
            feat = main["feat"].reshape(-1, NUM_FEATURES).astype(jnp.float32)
            hh, ww = main["out"].shape[1:3]
            if from_source_labels:
                lbl = resize_nearest(labels_or_zero.astype(jnp.float32), (hh, ww))
                lbl = lbl.reshape(-1).astype(jnp.int32)
                onehot = (lbl[:, None] == jnp.arange(C)).astype(jnp.float32)  # 255 → zero row
            else:
                onehot = P.onehot_assign(main["out"].reshape(-1, C).astype(jnp.float32))
            # rows padded in for mesh divisibility contribute NOTHING to the
            # class moments: valid 0 zeroes their one-hot assignment
            onehot = onehot * jnp.repeat(valid.astype(jnp.float32), hh * ww)[:, None]
            vect, sq, sums = P.class_moments(feat, onehot)
            proto = P.append(state.proto, vect, sq, sums)
            return state.replace(proto=proto, rng=rng)

        return jax.jit(boot, donate_argnums=0)

    def calculate_prototypes(self, loader) -> None:
        from_source = self.cfg_spec.STARTING_PROTO == "source"
        boot = self._build_bootstrap(from_source)
        it = loader.sequential() if hasattr(loader, "sequential") else loader
        # multi-host/mesh: the (reference-faithful) single-sample bootstrap
        # batches must still form a global batch divisible by the data axis —
        # pad this host's rows up to data_axis/process_count with masked rows
        # (found by the 2-process multi-step train test: a 1-row local batch
        # over a 4-device mesh is un-placeable)
        mult = 1
        if self.mesh is not None and "data" in self.mesh.shape:
            mult = max(1, self.mesh.shape["data"] // jax.process_count())
        for batch in it:
            images = np.asarray(batch["image"])
            n = len(images)
            pad = (-n) % mult
            valid = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)
            if pad:
                # pad by TILING the real rows, not zeros: boot runs train-mode
                # batch-stat BN, so padded rows enter the batch mean/var that
                # normalizes the real rows. Tiled copies leave the statistics
                # exact for the reference-faithful single-sample bootstrap
                # batches (all rows identical ⇒ same mean/var as the original)
                # while the valid mask still zeroes the duplicates' class-
                # moment contribution (advisor r4 medium).
                tile = np.arange(n, n + pad) % n
                images = np.concatenate([images, images[tile]])
            if from_source:
                labels = np.asarray(batch["label"])
                if pad:
                    labels = np.concatenate([labels, labels[tile]])
                labels = self._place(labels)
            else:
                labels = jnp.zeros(())
            self.state = boot(self.state, self._place(images), labels,
                              self._place(valid))
        from ..parallel import is_primary

        if is_primary():  # pickles are global state: one writer per cluster
            P.save(self.state.proto, self._proto_path("current"))

    def _proto_path(self, tag):
        root = self.cfg.OTHERS.SNAPSHOT_DIR
        os.makedirs(root, exist_ok=True)
        return os.path.join(root, f"proto_{tag}.pickle")

    # ------------------------------------------------------------------
    # evaluation (reference da_model.evaluate/evaluate_all + proto override,
    # adaptation_model.py:127-179, prototypes.py:374-394)
    # ------------------------------------------------------------------
    def _build_eval(self, with_proto: bool):
        model, monitor, policy, spec = self.model, self.monitor, self.policy, self.cfg_spec
        C = self.num_classes
        metric = spec.DISTANCE_MEASURE
        static_on = float(spec.STATIC_LAMBDA) > 0
        out_hw = self.resolution_hw
        ece_on = self.ece_record

        def eval_step(state: AdaptState, images, labels, valid_mask, hists, eces):
            labels = labels.astype(jnp.int32)
            _, main = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats}, images, train=False
            )
            preds = {"model": main["out"]}
            if with_proto:
                # all models in eval mode; monitor/switch frozen (reference
                # prototypes.py:112-118, prototypes_hybrid_switch.py:103-109)
                _, ema_main = model.apply(
                    {"params": state.ema_params, "batch_stats": state.batch_stats},
                    images, train=False,
                )
                prior_ema = _softmax(ema_main["out"])
                prior_static = None
                if static_on:
                    _, st = model.apply(
                        {"params": state.static_params, "batch_stats": state.static_batch_stats},
                        images, train=False,
                    )
                    prior_static = _softmax(st["out"])

                def dyn_forward():
                    _, dm = model.apply(
                        {"params": state.dynamic_params, "batch_stats": state.dynamic_batch_stats},
                        images, train=False,
                    )
                    return _softmax(dm["out"])

                prior, _, _, _, _ = compute_prior(
                    policy, spec, monitor, state.monitor, state.switch,
                    prior_ema, prior_static, dyn_forward, frozen=jnp.asarray(True),
                )
                b, hh, ww, _ = prior_ema.shape
                feat = ema_main["feat"].reshape(-1, NUM_FEATURES).astype(jnp.float32)
                dis = P.distances(feat, state.proto, metric)
                soft = P.fuse_prior(P.proto_probs(dis, state.proto.tau), prior.reshape(-1, C))
                preds["proto"] = soft.reshape(b, hh, ww, C)
            for key, logit_map in preds.items():
                probs = _softmax(upsample_bilinear_ac(logit_map, out_hw))
                hists[key] = hists[key] + M.fast_hist(labels, probs.argmax(-1), C)
                if ece_on:
                    # padded rows (valid_mask 0) are excluded; real 255-ignore
                    # pixels still count as incorrect, exactly like the reference
                    eces[key] = M.ece_record(
                        eces[key], probs, labels, valid_mask[:, None, None])
            return hists, eces

        return jax.jit(eval_step)

    def eval_fn(self, with_proto: bool):
        if with_proto not in self._eval_cache:
            self._eval_cache[with_proto] = self._build_eval(with_proto)
        return self._eval_cache[with_proto]

    def evaluate(self, loader) -> dict:
        with_proto = not bool(value_or(self.cfg_spec.SKIP_PROTO_EVAL, False))
        fn = self.eval_fn(with_proto)
        keys = ["model"] + (["proto"] if with_proto else [])
        C = self.num_classes
        bins = 1000 if unset(self.cfg.OTHERS.BINS) else int(self.cfg.OTHERS.BINS)
        hists = {k: jnp.zeros((C, C), jnp.int32) for k in keys}
        eces = {k: M.ece_init(bins) for k in keys}
        for batch in loader:
            labels = np.asarray(batch["label"], np.int32)
            valid = batch.get("valid", len(labels))
            if valid < len(labels):  # padded final batch: mask out the padding
                labels = labels.copy()
                labels[valid:] = 255
            valid_mask = (np.arange(len(labels)) < valid).astype(np.float32)
            hists, eces = fn(
                self.state, self._place(batch["image"]), self._place(labels),
                self._place(valid_mask), hists, eces
            )
        result = {k: M.per_class_iu(np.asarray(h)) for k, h in hists.items()}
        self._last_ece = (
            {f"ece {k}": float(M.ece_value(a)) for k, a in eces.items()} if self.ece_record else {}
        )
        return result

    def evaluate_all(self, validation_loaders: dict) -> dict:
        log = {}
        for val_set, loader in validation_loaders.items():
            result = self.evaluate(loader)
            for key, per_class in result.items():
                log[f"Val mIoU {key} of {val_set}"] = float(np.nanmean(per_class))
                log[f"Val std IoU {key} of {val_set}"] = float(np.nanstd(per_class))
            for name, value in getattr(self, "_last_ece", {}).items():
                log[f"{name} {val_set}"] = value
        return log

    def test_on_samples(self, validation_loaders: dict, n: int = 10) -> dict:
        """Log segmentation-mask sample images per validation set
        (reference da_model.test_on_samples, adaptation_model.py:181-200).

        Values are `MaskSample`s: the wandb sink renders them as interactive
        mask overlays exactly like the reference's `wandb_image`
        (reference utils/logging.py:5-17); the JSONL sink records the saved
        PNG path.
        """
        from ..data.metadata import load_dataset_info
        from ..utils.viz import MaskSample, denormalize_rgb, save_sample

        info = load_dataset_info()
        palette = info["palette"]
        class_labels = (
            self.cfg.classnum_to_label
            if not unset(self.cfg.classnum_to_label)
            else info["classnum_to_label"]
        )
        mean = self.cfg.SCHEME.MEAN if not unset(self.cfg.SCHEME.MEAN) else [0, 0, 0]
        std = self.cfg.SCHEME.STD if not unset(self.cfg.SCHEME.STD) else [255, 255, 255]
        out_dir = os.path.join(self.cfg.OTHERS.SNAPSHOT_DIR, "samples")
        fn = self.eval_fn_predict()
        log = {}
        for val_set, loader in validation_loaders.items():
            count = 0
            for batch in loader:
                from ..parallel import host_local_rows

                # the predict output is batch-sharded: render THIS host's rows
                # (they align with the host-local loader batch); only the
                # primary host writes files
                preds = host_local_rows(fn(self.state, self._place(batch["image"])))
                for b in range(len(preds)):
                    if count >= n:
                        break
                    label = batch.get("label")
                    label_b = np.asarray(label[b]) if label is not None else None
                    image_b = np.asarray(batch["image"][b])
                    rgb_b = denormalize_rgb(image_b, mean, std)
                    from ..parallel import is_primary

                    path = None if not is_primary() else save_sample(
                        rgb_b, preds[b], label_b, palette,
                        os.path.join(out_dir, f"{val_set}_{count}_step{int(self.state.step)}.png"),
                    )
                    log[f"Condition {val_set} sample {count}"] = MaskSample(
                        rgb_b, preds[b], label_b,
                        class_labels, f"Sample from {val_set}", path,
                    )
                    count += 1
                if count >= n:
                    break
        return log

    def eval_fn_predict(self):
        if "predict" not in self._eval_cache:
            model, out_hw = self.model, self.resolution_hw

            @jax.jit
            def predict(state, images):
                _, main = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats}, images, train=False
                )
                out = main["out"] if isinstance(main, dict) else main
                return upsample_bilinear_ac(out.astype(jnp.float32), out_hw).argmax(-1)

            self._eval_cache["predict"] = predict
        return self._eval_cache["predict"]

    def _maybe_update_dynamic(self, dev_fn) -> bool:
        """AUTO_DYNAMIC host cadence: refresh the dynamic teacher from the
        student when the static-confidence derivative moves, at most once per
        `patience` steps (reference evaluate_update_dynamic,
        prototypes.py:396-405 — counter increments every step, the derivative
        is only consulted past the patience threshold, and the counter resets
        ONLY on an actual refresh; the reference hardcodes patience 500).
        `dev_fn` defers the dev-avg read so the packed-log D2H sync happens
        only on the rare past-patience steps."""
        spec = self.cfg_spec
        patience = int(value_or(spec.AUTO_DYNAMIC_PATIENCE, 500))
        self.dynamic_update_counter += 1
        if self.dynamic_update_counter > patience:
            if abs(float(dev_fn())) > float(spec.DEV_THRESH):
                self.state = self._copy_dynamic(self.state)
                self.dynamic_update_counter = 0
                return True
        return False

    # ------------------------------------------------------------------
    # train loop (reference prototypes.py:466-520)
    # ------------------------------------------------------------------
    def train(self, trainloader, targetloader, validation_loaders) -> None:
        spec = self.cfg_spec
        auto_dynamic = bool(value_or(spec.AUTO_DYNAMIC, False))
        if not auto_dynamic:
            self.state = self._copy_dynamic(self.state)
        if not spec.SKIP_CALC:
            if not self.skip_proto:
                print("Computing Prototypes")
                src = trainloader if spec.STARTING_PROTO == "source" else targetloader
                self.calculate_prototypes(src)
                self.skip_proto = True
            print("Model evaluation")
            self._log(self.evaluate_all(validation_loaders))

        steps = int(spec.EPOCHS) * len(targetloader)
        source_repeat = int(spec.SOURCE_REPEAT)
        have_src = float(self.cfg.TRAINING.REPLAY_BUFFER) > 0 and trainloader is not None
        perc_fill = float(value_or(self.cfg.TRAINING.PERC_FILL_PER_DOMAIN, 0.0))
        update_prob = 0.0
        if steps:
            update_prob = (
                perc_fill
                * float(self.cfg.TRAINING.REPLAY_BUFFER)
                / float(self.cfg.TRAINING.BATCH_SIZE)
                / steps
            )
        want_soft = update_prob > 0
        # per-step raw prediction dumps (reference pseudolabel_loss,
        # prototypes.py:286-287 -> adaptation_model.save_prediction :218-232)
        want_pred = not unset(spec.PREDICTION_SAVE)
        step = self.step_fn(have_src, source_repeat, want_soft, want_pred)

        from ..data.loader import DeviceFeeder, cycle

        if not have_src:
            src_iter = None
        elif hasattr(trainloader, "add_from_batch"):  # ReplayBuffer: already endless
            src_iter = iter(trainloader)
        else:
            src_iter = cycle(trainloader)
        # double-buffer the target stream: the next batch's H2D transfer runs
        # while the current step computes (SURVEY.md §7.3 item 6)
        trg_iter = DeviceFeeder(cycle(targetloader), device_keys=("image",), put=self._place)
        # ... and the source-replay stream (leading SOURCE_REPEAT axis; the
        # batch axis to shard is 1). For a MUTATING replay buffer, prefetching
        # would draw each batch one step before the previous step's buffer
        # insertions land — a deviation from the reference's sampling dynamics
        # — so buffers default to synchronous draws; OTHERS.PREFETCH_SOURCE:
        # true opts into the (one-step-stale) overlap.
        if src_iter is not None:
            def stacked_src():
                while True:
                    batches = [next(src_iter) for _ in range(source_repeat)]
                    yield {
                        "image": np.stack([b["image"] for b in batches]),
                        "label": np.stack(
                            [self._src_label(b) for b in batches]
                        ).astype(np.int32),
                    }

            mutating = hasattr(trainloader, "add_from_batch")
            prefetch_src = bool(value_or(self.cfg.OTHERS.PREFETCH_SOURCE, not mutating))
            if prefetch_src:
                src_feed = DeviceFeeder(
                    stacked_src(), device_keys=("image", "label"),
                    put=lambda a: self._place(a, 1),
                )
            else:
                def placed_src():
                    for batch in stacked_src():
                        yield {
                            "image": self._place(batch["image"], 1),
                            "label": self._place(batch["label"], 1),
                        }

                src_feed = placed_src()
        rng = np.random.default_rng(int(self.cfg.TRAINING.RANDOM_SEED))
        power = float(spec.POWER)
        base_lr = float(spec.LEARNING_RATE)

        # step-interval checkpointing (beyond the reference's per-epoch cadence):
        # with exact whole-state resume this bounds lost work after a failure
        save_every = int(value_or(self.cfg.OTHERS.SAVE_EVERY, 0))
        # OTHERS.PROFILE: N → capture a jax.profiler trace of N steady-state
        # steps (skipping warmup/compile) under SNAPSHOT_DIR/profile
        # (the TPU stand-in for the reference's CUDA-event stage timing,
        # SURVEY.md §5.1)
        profile_steps = int(value_or(self.cfg.OTHERS.PROFILE, 0))
        profile_at = 5
        if profile_steps and steps <= 5 + profile_steps:
            # too few steps to skip warmup/compile — a trace would capture the
            # first-step XLA compile and be useless; refuse rather than mislead
            print(f"OTHERS.PROFILE: need > {5 + profile_steps} steps, have {steps}; skipping trace")
            profile_steps = 0
        profiling = False
        import time as _time

        # OTHERS.SCHEDULE: host-side stage timing of the online loop — the
        # online-adaptation counterpart of the reference's PytorchSpeedMeasure
        # in source pretraining (reference utils/monitoring.py:139-161,
        # methods/segmentation.py:65-101). Stages: Batch Fetch (host wait for
        # the prefetched, already-transferred batch), Step Dispatch (jit call),
        # Host Work (buffer/aux), Log Sync (the packed-D2H materialization).
        meter = SpeedMeter(
            limit=20,
            enabled=bool(value_or(self.cfg.OTHERS.SCHEDULE, False)),
        )
        frames_done = 0
        wall_t0 = _time.perf_counter()
        for i_iter in range(steps):
            meter.reset()
            lr = base_lr * (1.0 - i_iter / steps) ** power if power else base_lr
            if have_src:
                src_batch = next(src_feed)
                src_images, src_labels = src_batch["image"], src_batch["label"]
            else:
                src_images = jnp.zeros((0,))
                src_labels = jnp.zeros((0,), jnp.int32)
            if profile_steps and i_iter == profile_at:
                jax.profiler.start_trace(
                    os.path.join(str(self.cfg.OTHERS.SNAPSHOT_DIR), "profile")
                )
                profiling = True
            trg_batch = next(trg_iter)
            meter.mark("Batch Fetch")
            if i_iter == 0:
                # OTHERS.AOT_CACHE: serialized-executable cold start — a warm
                # host deserializes the fused step instead of paying the XLA
                # compile (minutes through a tunneled chip; utils/aot_cache.py).
                # true → the default cache dir; a string → that directory.
                aot = value_or(self.cfg.OTHERS.AOT_CACHE, True)
                if aot:
                    step.aot_warm(
                        self.state, trg_batch["image"], src_images, src_labels,
                        jnp.asarray(lr, jnp.float32),
                        cache_dir=None if aot is True else str(aot),
                        tag=f"adapt_{self.resolution_hw[0]}x{self.resolution_hw[1]}",
                    )
            self.state, logs = step(
                self.state, trg_batch["image"], src_images, src_labels,
                jnp.asarray(lr, jnp.float32),
            )
            meter.mark("Step Dispatch")
            host_logs = {}
            if want_pred:
                self._save_prediction(logs.pop("target_logits"))
            if auto_dynamic:
                self._maybe_update_dynamic(lambda: float(logs["dev avg prior static"]))
            host_logs["Total buffer updates"] = self._buffer_update(
                trg_batch, logs.pop("soft_predictions", None), update_prob, trainloader, rng
            )
            if profiling and i_iter + 1 == profile_at + profile_steps:
                jax.block_until_ready(logs["Total target loss"])
                jax.profiler.stop_trace()
                profiling = False
            if save_every and (i_iter + 1) % save_every == 0:
                self.save_model()
            if i_iter == 0:
                # exclude the first step's XLA compile from the throughput number
                host_logs["Step compile+run seconds"] = _time.perf_counter() - wall_t0
                frames_done = 0
                wall_t0 = _time.perf_counter()
            else:
                frames_done += int(np.shape(trg_batch["image"])[0])
            if (i_iter + 1) % len(targetloader) == 0:
                # steady-state streaming throughput for the epoch just finished
                # (includes host data prep + H2D — the end-to-end number, unlike
                # bench.py's device-only step time); eval/checkpoint time between
                # epochs is excluded by resetting the clock below
                elapsed = _time.perf_counter() - wall_t0
                if elapsed > 0 and frames_done:
                    host_logs["Adaptation frames per second"] = frames_done / elapsed
                print("Model evaluation")
                host_logs.update(self.evaluate_all(validation_loaders))
                samples_every = int(value_or(self.cfg.OTHERS.GENERATE_SAMPLES_EVERY, 10))
                # double-modulo cadence + the 0 opt-out live in samples_due
                # (at 512×1024 each epoch's samples cost ~30 PNG renders +
                # tunnel materializations, hence the opt-out).
                if samples_due(samples_every, i_iter, len(targetloader)):
                    host_logs.update(self.test_on_samples(validation_loaders))
                self.save_model()
                frames_done = 0
                wall_t0 = _time.perf_counter()
            meter.mark("Host Work")
            logs.update(host_logs)
            if meter.enabled:
                logs["Total target loss"]  # force the packed-D2H sync
                meter.mark("Log Sync")
                logs.update(meter.averages())
            self._log(logs)
        if profiling:  # trace window ran past the end of the domain
            jax.profiler.stop_trace()
        self.save_model()

    def _save_prediction(self, logits_nhwc) -> None:
        """Dump per-step raw target logits (reference adaptation_model.py:218-232)."""
        base = os.path.join(
            str(self.cfg_spec.PREDICTION_SAVE), "_".join(str(self.cfg_spec.set_))
        )
        counter = self.prediction_counter.setdefault(self.cfg_spec.set_, 0)
        from ..parallel import fetch_global, is_primary

        # collective on every host (multi-host shards span processes); one writer
        logits_nhwc = fetch_global(logits_nhwc)
        if is_primary():
            os.makedirs(base, exist_ok=True)
            dump_logits_batch(base, counter, logits_nhwc)
        self.prediction_counter[self.cfg_spec.set_] = counter + 1

    def _src_label(self, batch):
        if "stored_predictions" in batch:
            return np.asarray(batch["stored_predictions"])
        return np.asarray(batch["label_res"])

    def _buffer_update(self, trg_batch, soft_nhwc, probability, trainloader, rng) -> int:
        """Push pseudo-labeled target frames into the replay buffer
        (reference buffer_update, prototypes.py:453-464)."""
        if probability <= 0 or soft_nhwc is None or not hasattr(trainloader, "add_from_batch"):
            return 0
        from ..parallel import host_local_rows

        total = 0
        # multi-host: the buffer is per-host by design (parallel/distributed.py)
        # — each host considers ITS rows of the global batch; the device arrays
        # (image, soft predictions) reduce to this host's shard, and batch_n is
        # the local count. Single host: bit-identical to plain np.asarray.
        trg_batch = {k: host_local_rows(v) if k == "image" else v
                     for k, v in trg_batch.items()}
        batch_n = len(trg_batch["image"])
        hits = np.where(rng.random(batch_n) < probability)[0]
        if len(hits):
            soft = host_local_rows(soft_nhwc)
            up = np.asarray(
                upsample_bilinear_ac(jnp.asarray(soft), self.resolution_hw).argmax(-1)
            ).astype(np.int32)
            hh, ww = soft.shape[1:3]
            trg_batch = dict(trg_batch)
            trg_batch["stored_predictions"] = np.asarray(
                resize_nearest(jnp.asarray(up.astype(np.float32)), (hh, ww))
            ).astype(np.int32)
            trg_batch["label"] = up  # full-res pseudo label (documented deviation:
            # the reference stores only input-res argmax, see replay_buffer.py)
            # the 1/8-grid label slot also holds the PSEUDO label: replayed
            # target frames must never train against their ground truth (and
            # label-less streams have no label_res to begin with)
            trg_batch["label_res"] = trg_batch["stored_predictions"]
            for index in hits:
                trainloader.add_from_batch(trg_batch, int(index))
                total += 1
        return total

    # ------------------------------------------------------------------
    # persistence (reference adaptation_model.py:202-216 + prototype pickles)
    # ------------------------------------------------------------------
    def save_model(self) -> None:
        from ..utils import checkpoint as ckpt

        root = self.cfg.OTHERS.SNAPSHOT_DIR
        os.makedirs(root, exist_ok=True)
        # OTHERS.ASYNC_SAVE: return once device arrays are snapshot to host;
        # the disk write overlaps the online loop (utils/checkpoint.py)
        ckpt.save_state(self.state, root,
                        wait=not bool(value_or(self.cfg.OTHERS.ASYNC_SAVE, False)))
        from ..parallel import is_primary

        if is_primary():
            P.save(self.state.proto, self._proto_path(self.cfg_spec.set_ or "current"))

    def load_model(self, path: str) -> None:
        """Load a checkpoint: `adapt_state` orbax dirs restore the FULL state
        (exact resume); `model_train_*` (SEGMENT pretraining) dirs and torch
        .pth files restore the student only (the reference's LOAD_MODEL
        semantics, prototypes.py:95-96)."""
        if os.path.isdir(path):
            from ..utils import checkpoint as ckpt

            base = os.path.basename(path)
            if base.startswith("advent_state"):
                # an ADVENT run's snapshot: lift the student (params +
                # batch_stats) out of the full AdventState tree — the
                # reference can likewise evaluate an advent-trained model
                # (it saves a plain model .pth, reference advent_da.py:62-70)
                raw = ckpt.load_raw(os.path.dirname(path), base)
                self.state = self.state.replace(
                    params=jax.tree.map(
                        lambda t, v: jnp.asarray(v, t.dtype), self.state.params,
                        raw["params"],
                    ),
                    batch_stats=jax.tree.map(
                        lambda t, v: jnp.asarray(v, t.dtype), self.state.batch_stats,
                        raw["batch_stats"],
                    ),
                )
            elif base.startswith("model_train"):
                restored = ckpt.load_state(
                    {"params": self.state.params, "batch_stats": self.state.batch_stats},
                    os.path.dirname(path), base,
                )
                self.state = self.state.replace(
                    params=restored["params"], batch_stats=restored["batch_stats"]
                )
            else:
                self.state = ckpt.load_state(self.state, os.path.dirname(path), base)
            return
        from ..models.import_torch import load_torch_checkpoint, torch_state_dict_to_flax

        sd = load_torch_checkpoint(path)
        variables = torch_state_dict_to_flax(
            sd, {"params": self.state.params, "batch_stats": self.state.batch_stats}
        )
        self.state = self.state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )

    def _log(self, metrics: dict) -> None:
        if self.logger is not None:
            self.logger.log(metrics)
