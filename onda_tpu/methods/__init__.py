"""Adaptation engines: fused online-proDA step (+switch policies), ADVENT, pretraining."""
