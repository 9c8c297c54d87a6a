"""PROTO_ADVENT: prototype pseudo-labeling + adversarial entropy in one step.

Reference `adv_proDA` composes an hswitch prototype model and an advent instance
sharing the same network (reference methods/prototype_advent.py:14-17); its step
runs source supervised loss with double-BN exchange, prototype pseudo-label
losses, the adversarial generator loss and discriminator training in one
iteration (reference :23-152). Here all of it is one jitted function over
(AdaptState, discriminator state).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import value_or
from ..ops import losses as L
from ..ops import prototypes as P
from ..ops.interp import upsample_bilinear_ac
from . import optim
from .advent import SOURCE_LABEL, TARGET_LABEL
from .prior_policy import compute_prior
from .proto_online import MONITOR_KEYS, NUM_FEATURES, ProtoOnlineAdapter, _conf, _softmax
from .timing import samples_due


class ProtoAdventAdapter(ProtoOnlineAdapter):
    def __init__(self, model, variables, cfg, cfg_spec, num_classes, logger=None):
        super().__init__(model, variables, cfg, cfg_spec, num_classes, logger)
        from ..models.discriminator import FCDiscriminator

        self.disc = FCDiscriminator()
        h, w = self.resolution_hw
        d_in = jnp.zeros((1, h, w, num_classes))
        d_aux = self.disc.init(jax.random.key(1), d_in)["params"]
        d_main = self.disc.init(jax.random.key(2), d_in)["params"]
        self.d_state = {
            "aux": d_aux, "aux_opt": optim.adam_init(d_aux),
            "main": d_main, "main_opt": optim.adam_init(d_main),
        }
        if self.mesh is not None:
            from ..parallel.mesh import replicate_tree

            self.d_state = replicate_tree(self.mesh, self.d_state)  # same mesh as AdaptState
        self._pa_step = None

    def _invalidate_step_caches(self):
        super()._invalidate_step_caches()
        self._pa_step = None

    def _build_pa_step(self):
        spec = self.cfg_spec
        model, disc, monitor = self.model, self.disc, self.monitor
        C = self.num_classes
        out_hw = self.resolution_hw
        multi = bool(self.cfg.MODEL.MULTI_LEVEL)
        metric = spec.DISTANCE_MEASURE
        ma_lambda = float(spec.MA_LAMBDA)
        pseudo_thresh = float(spec.PSEUDO_THRESH)
        soft_labels = bool(value_or(spec.SOFT_LABELS, False))
        rce_alpha, rce_beta = float(spec.RCE_ALPHA), float(spec.RCE_BETA)
        reg_weight, regularizer = float(spec.REGULARIZER_WEIGHT), spec.REGULARIZER
        js_d = float(spec.JS_D)
        l_seg_main, l_seg_aux = float(spec.LAMBDA_SEG_MAIN), float(spec.LAMBDA_SEG_AUX)
        l_adv_main, l_adv_aux = float(spec.LAMBDA_ADV_MAIN), float(spec.LAMBDA_ADV_AUX)
        momentum, weight_decay = float(spec.MOMENTUM), float(spec.WEIGHT_DECAY)
        ema_update = float(spec.EMA_UPDATE)
        static_on = float(spec.STATIC_LAMBDA) > 0
        conf_reg_thresh = self.conf_reg_thresh
        labels_tree = self.param_labels
        r0, r1 = self.lr_ratios

        ent = lambda logits_up: L.prob_2_entropy(
            jax.nn.softmax(logits_up.astype(jnp.float32), axis=-1))
        pick = lambda o: o["out"] if isinstance(o, dict) else o

        def step(state, d_state, src_images, src_labels, trg_images, lr_base, lr_d):
            rng, r_ema, r_trg, r_src = jax.random.split(state.rng, 4)
            mon = state.monitor

            # --- hswitch prototype predictions (no grad) -------------------
            _, ema_main = model.apply(
                {"params": state.ema_params, "batch_stats": state.batch_stats},
                trg_images, train=True, update_stats=False, dropout_rng=r_ema,
            )
            prior_ema = _softmax(ema_main["out"])
            mon = monitor.add(mon, "prior EMA", _conf(prior_ema))
            prior_static = None
            if static_on:
                _, st = model.apply(
                    {"params": state.static_params, "batch_stats": state.static_batch_stats},
                    trg_images, train=False,
                )
                prior_static = _softmax(st["out"])
                mon = monitor.add(mon, "prior static", _conf(prior_static))

            def dyn_forward():
                _, dm = model.apply(
                    {"params": state.dynamic_params, "batch_stats": state.dynamic_batch_stats},
                    trg_images, train=False,
                )
                return _softmax(dm["out"])

            prior, dyn_p, calc_dyn, switch, plogs = compute_prior(
                "hswitch", spec, monitor, mon, state.switch, prior_ema, prior_static,
                dyn_forward, frozen=jnp.asarray(False),
            )
            if "percentage_static" in plogs:
                mon = monitor.add(mon, "percentage_static", plogs["percentage_static"])
            mon = monitor.add(mon, "prior dynamic", _conf(dyn_p), enable=calc_dyn)
            mon = monitor.add(mon, "prior", _conf(prior))
            b, hh, ww, _ = prior_ema.shape
            feat = ema_main["feat"].reshape(-1, NUM_FEATURES).astype(jnp.float32)
            dis = P.distances(feat, state.proto, metric)
            prop = P.proto_probs(dis, state.proto.tau)
            mon = monitor.add(mon, "prototypes", _conf(prop))
            tau_bump = monitor.avg(mon, "prototypes") > conf_reg_thresh
            new_tau = state.proto.tau + 0.001 * tau_bump.astype(jnp.float32)
            mon = monitor.add(mon, "tau", new_tau, enable=tau_bump)
            prior_flat = prior.reshape(-1, C)
            pseudolabels = P.hard_labels(
                P.fuse_prior(prop, prior_flat), pseudo_thresh
            ).reshape(b, hh, ww)
            soft_predictions = P.fuse_prior(P.proto_probs(dis, new_tau), prior_flat)
            mon = monitor.add(mon, "pseudolabel confidence", _conf(soft_predictions))
            onehot = P.onehot_assign(ema_main["out"].reshape(-1, C).astype(jnp.float32))
            vect, sq, sums = P.class_moments(feat, onehot)
            proto = P.ma(state.proto.replace(tau=new_tau), vect, sq, sums, ma_lambda)
            trg_target = (
                soft_predictions.reshape(b, hh, ww, C) if soft_labels else pseudolabels
            )

            # --- generator losses ------------------------------------------
            # source (alt-BN, the reference's double-BN exchange) and target
            # (main-BN) passes run as ONE vmapped 2-slice forward inside the
            # grad: the two slices carry their own batch_stats collections and
            # BN reduces per slice, so this is numerically the sequential
            # schedule (see proto_online._build_step; 2.2x faster at batch 4)
            merge_src = os.environ.get("ONDA_MERGE_SRC_TRG", "1") != "0"

            def gen_loss(params):
                if merge_src:
                    xs = jnp.stack([src_images, trg_images])
                    stats_in = jax.tree.map(
                        lambda a, m: jnp.stack([a, m]),
                        state.alt_batch_stats, state.batch_stats,
                    )
                    keys = jnp.stack([r_src, r_trg])

                    def one(x, stats, key):
                        (aux_o, main_o), mut = model.apply(
                            {"params": params, "batch_stats": stats}, x,
                            train=True, update_stats=True, dropout_rng=key,
                            mutable=["batch_stats"],
                        )
                        aux_pick = (
                            pick(aux_o) if (multi and aux_o is not None)
                            else jnp.zeros((), jnp.float32)
                        )
                        return aux_pick, main_o["out"], mut["batch_stats"]

                    auxs, mains, muts = jax.vmap(one)(xs, stats_in, keys)
                    mut_alt = {"batch_stats": jax.tree.map(lambda t: t[0], muts)}
                    mut = {"batch_stats": jax.tree.map(lambda t: t[1], muts)}
                    src_aux = auxs[0] if multi else None
                    trg_aux = auxs[1] if multi else None
                    src_main, trg_main = mains[0], {"out": mains[1]}
                else:
                    # source pass with double-BN exchange (reference prototype_advent.py:33-44)
                    (src_aux, src_main), mut_alt = model.apply(
                        {"params": params, "batch_stats": state.alt_batch_stats},
                        src_images, train=True, update_stats=True,
                        dropout_rng=r_src, mutable=["batch_stats"],
                    )
                    # target pass (main BN set)
                    (trg_aux, trg_main), mut = model.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        trg_images, train=True, update_stats=True,
                        dropout_rng=r_trg, mutable=["batch_stats"],
                    )
                src_main_up = upsample_bilinear_ac(pick(src_main), out_hw)
                seg = l_seg_main * L.cross_entropy_2d(src_main_up, src_labels)
                src_aux_up = None
                if multi and src_aux is not None:
                    src_aux_up = upsample_bilinear_ac(pick(src_aux), out_hw)
                    seg = seg + l_seg_aux * L.cross_entropy_2d(src_aux_up, src_labels)
                out_t = trg_main["out"].astype(jnp.float32)
                ce = L.cross_entropy_2d(out_t, trg_target, soft=soft_labels) if rce_alpha > 0 else jnp.zeros(())
                rce_l = L.rce(out_t, trg_target, soft=soft_labels) if rce_beta > 0 else jnp.zeros(())
                sym = rce_alpha * ce + rce_beta * rce_l
                reg = L.regular_loss(regularizer, out_t) if reg_weight > 0 else jnp.zeros(())
                js = L.js_divergence(out_t, pseudolabels) if js_d > 0 else jnp.zeros(())
                total_t = sym + reg_weight * reg + js_d * js
                trg_main_up = upsample_bilinear_ac(out_t, out_hw)
                adv = l_adv_main * L.bce_with_logits(
                    disc.apply({"params": d_state["main"]}, ent(trg_main_up)), SOURCE_LABEL
                )
                trg_aux_up = None
                if multi and trg_aux is not None:
                    trg_aux_up = upsample_bilinear_ac(pick(trg_aux), out_hw)
                    adv = adv + l_adv_aux * L.bce_with_logits(
                        disc.apply({"params": d_state["aux"]}, ent(trg_aux_up)), SOURCE_LABEL
                    )
                ups = jax.tree.map(
                    jax.lax.stop_gradient, (src_aux_up, src_main_up, trg_aux_up, trg_main_up)
                )
                aux_out = {
                    "stats_main": mut["batch_stats"], "stats_alt": mut_alt["batch_stats"],
                    "out_t": jax.lax.stop_gradient(out_t), "ups": ups,
                    "logs": {
                        "Segmentation loss": seg, "Adversarial loss": adv,
                        "ce_loss": ce, "rce_loss": rce_l, "sym_loss": sym,
                        "regularization_loss": reg, "JS Divergance loss": js,
                        "Total target loss": total_t,
                    },
                }
                return seg + total_t + adv, aux_out

            grads, aux = jax.grad(gen_loss, has_aux=True)(state.params)
            src_aux_up, src_main_up, trg_aux_up, trg_main_up = aux["ups"]

            def disc_loss(d_params):
                d_aux_p, d_main_p = d_params
                loss = L.bce_with_logits(
                    disc.apply({"params": d_main_p}, ent(src_main_up)), SOURCE_LABEL
                ) / 2 + L.bce_with_logits(
                    disc.apply({"params": d_main_p}, ent(trg_main_up)), TARGET_LABEL
                ) / 2
                if src_aux_up is not None:
                    loss = loss + L.bce_with_logits(
                        disc.apply({"params": d_aux_p}, ent(src_aux_up)), SOURCE_LABEL
                    ) / 2 + L.bce_with_logits(
                        disc.apply({"params": d_aux_p}, ent(trg_aux_up)), TARGET_LABEL
                    ) / 2
                return loss

            d_loss, (d_aux_g, d_main_g) = jax.value_and_grad(disc_loss)(
                (d_state["aux"], d_state["main"])
            )
            new_params, new_mom = optim.update(
                state.params, grads, state.opt_momentum, labels_tree,
                lr_base * r0, lr_base * r1, momentum, weight_decay,
            )
            d_main_p, d_main_opt = optim.adam_update(d_state["main"], d_main_g, d_state["main_opt"], lr_d)
            if multi:
                d_aux_p, d_aux_opt = optim.adam_update(d_state["aux"], d_aux_g, d_state["aux_opt"], lr_d)
            else:
                d_aux_p, d_aux_opt = d_state["aux"], d_state["aux_opt"]
            new_ema = jax.tree.map(
                lambda e, p: ema_update * e + (1.0 - ema_update) * p, state.ema_params, new_params
            )
            logs = dict(aux["logs"])
            logs["Discriminator loss"] = d_loss
            logs["pseudolabel_pixel_num"] = (
                ((pseudolabels >= 0) & (pseudolabels != 255)).astype(jnp.float32).sum()
            )
            logs["mean_prototype_intensity_values"] = (proto.mean**2).mean()
            for key in MONITOR_KEYS:
                logs[f"{key} confidence ma"] = monitor.avg(mon, key)
            logs["dev avg prior static"] = monitor.dev_avg(mon, "prior static")
            new_state = state.replace(
                params=new_params, batch_stats=aux["stats_main"],
                alt_batch_stats=aux["stats_alt"], opt_momentum=new_mom,
                ema_params=new_ema, proto=proto, monitor=mon, switch=switch,
                rng=rng, step=state.step + 1,
            )
            new_d = {"aux": d_aux_p, "aux_opt": d_aux_opt, "main": d_main_p, "main_opt": d_main_opt}
            return new_state, new_d, logs

        # one packed lazy D2H for all scalar logs (see methods/logs_util.py)
        from .logs_util import packed_jit

        return packed_jit(step, donate_argnums=(0, 1))

    def train(self, trainloader, targetloader, validation_loaders) -> None:
        """Reference adv_proDA.train (prototype_advent.py:154-198): dynamic refresh
        once, bootstrap/eval on first domain, EMA per step, save at the end."""
        from ..data.loader import cycle

        spec = self.cfg_spec
        self.state = self._copy_dynamic(self.state)
        if not spec.SKIP_CALC:
            if not self.skip_proto:
                print("Computing Prototypes")
                src = trainloader if spec.STARTING_PROTO == "source" else targetloader
                self.calculate_prototypes(src)
                self.skip_proto = True
            self._log(self.evaluate_all(validation_loaders))
        steps = int(spec.EPOCHS) * len(targetloader)
        if self._pa_step is None:
            self._pa_step = self._build_pa_step()
        src_iter = iter(trainloader) if hasattr(trainloader, "add_from_batch") else cycle(trainloader)
        trg_iter = cycle(targetloader)
        base_lr, lr_d = float(spec.LEARNING_RATE), float(spec.LEARNING_RATE_D)
        power = float(spec.POWER)
        for i_iter in range(steps):
            lr = base_lr * (1.0 - i_iter / steps) ** power if power else base_lr
            src, trg = next(src_iter), next(trg_iter)
            if i_iter == 0:
                # OTHERS.AOT_CACHE (default on): serialized-executable cold
                # start, same contract as the PROTO_*/ADVENT loops
                aot = value_or(self.cfg.OTHERS.AOT_CACHE, True)
                if aot:
                    self._pa_step.aot_warm(
                        self.state, self.d_state,
                        self._place(src["image"]),
                        self._place(np.asarray(src["label"], np.int32)),
                        self._place(trg["image"]),
                        jnp.asarray(lr, jnp.float32), jnp.asarray(lr_d, jnp.float32),
                        cache_dir=None if aot is True else str(aot),
                        tag=f"padv_{self.resolution_hw[0]}x{self.resolution_hw[1]}",
                    )
            self.state, self.d_state, logs = self._pa_step(
                self.state, self.d_state,
                self._place(src["image"]),
                self._place(np.asarray(src["label"], np.int32)),
                self._place(trg["image"]),
                jnp.asarray(lr, jnp.float32), jnp.asarray(lr_d, jnp.float32),
            )
            host = {}
            if (i_iter + 1) % len(targetloader) == 0:
                host.update(self.evaluate_all(validation_loaders))
                samples_every = int(value_or(self.cfg.OTHERS.GENERATE_SAMPLES_EVERY, 10))
                if samples_due(samples_every, i_iter, len(targetloader)):
                    host.update(self.test_on_samples(validation_loaders))
            logs.update(host)
            self._log(logs)
        self.save_model()
