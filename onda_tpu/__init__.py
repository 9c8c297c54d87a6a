"""onda_tpu — a TPU-native (JAX / Flax / pjit / Pallas) online domain adaptation framework.

Re-designed from scratch with the capabilities of theo2021/OnDA (ECCV 2022,
"Online Domain Adaptation for Semantic Segmentation in Ever-Changing Conditions"):
a DeepLab-v2 segmenter that adapts online — while predicting — across a stream of
shifting weather domains, using class-prototype pseudo-labeling, EMA/static/dynamic
teacher models and confidence/derivative/hybrid switching policies, with an ADVENT
adversarial-entropy baseline.

Unlike the reference (a per-step Python loop with 4-5 separate model forwards on one
GPU), the whole adapt-then-predict step here — teacher forwards, prototype
distance/pseudo-label fusion, losses, EMA and prototype updates, monitor updates and
switch logic — is one jitted TPU step over a `jax.sharding.Mesh`, fed by an async
double-buffered input pipeline.

Layer map (mirrors SURVEY.md §1 of the structural analysis of the reference):
  config     — YAML config tree (reference: framework/domain_adaptation/config_ouda.py)
  registry   — model / dataset / method registries (reference: framework/handlers/)
  models     — Flax DeepLab-v2 family + discriminator (reference: framework/model/)
  ops        — pure-jnp/Pallas losses, metrics, monitors, prototype engine
               (reference: framework/utils/, methods/prototype_handler.py)
  data       — metadata tables, segmentation dataset, replay buffer, prefetch pipeline
               (reference: framework/dataset/)
  methods    — fused adaptation step + train loops (reference: framework/domain_adaptation/methods/)
  parallel   — mesh / sharding / collective helpers (no equivalent in the reference,
               which is single-GPU; see SURVEY.md §2.16)
"""

__version__ = "0.1.0"
