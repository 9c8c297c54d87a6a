"""Domain split builders over the metadata DataFrame.

One parameterized implementation replaces the reference's four near-identical
pandas split modules (reference weather_cityscapes_sets.py:11-35,
weather_cityscapes_fog_sets.py, weather_cityscapes_video_sets.py,
bern_video/video_sets.py): filter by optional column restrictions, then bucket
rows whose domain-`column` value is in each requested set tuple into train/val
frames.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pandas as pd


def get_split(
    table: pd.DataFrame,
    column: str,
    trainset: Sequence[Sequence],
    valset: Sequence[Sequence],
    restrictions: Mapping | None = None,
) -> dict:
    """Bucket metadata rows into {"train": {set_: df}, "val": {set_: df}}.

    `trainset`/`valset` are lists of tuples of domain values (a "set" may merge
    several intensities, e.g. the ADVENT config's [[25, 50, 75, 100, 200]]).
    """
    trainset = [tuple(pair) for pair in trainset]
    valset = [tuple(pair) for pair in valset]
    filtered = table
    for col, value in (restrictions or {}).items():
        filtered = filtered[filtered[col] == value]
    output = {"train": {}, "val": {}}
    for set_ in set(trainset) | set(valset):
        rows = filtered[filtered[column].isin(set_)]
        if set_ in trainset:
            # the VIDEO builders (valset empty — train-only streams) take the
            # WHOLE scene, ignoring the train/val column entirely (reference
            # weather_cityscapes_video_sets.py:26-31, bern_video/video_sets.py:
            # `output["train"][set_] = tmp`, no `set` filter); the labeled
            # builders bucket by it (weather_cityscapes_sets.py:30-34)
            output["train"][set_] = (
                rows if not valset else rows[rows["set"] == "train"]
            )
        if set_ in valset:
            output["val"][set_] = rows[rows["set"] == "val"]
    return output


def domain_splits(
    table: pd.DataFrame,
    column: str,
    domains: Sequence[Sequence],
    restrictions: Mapping | None = None,
    labeled_val: bool = True,
) -> list[dict]:
    """One get_split per domain (how the reference database handler iterates,
    reference framework/handlers/database_handler.py:30-72)."""
    out = []
    for domain in domains:
        split = get_split(table, column, [domain], [domain] if labeled_val else [], restrictions)
        out.append(split)
    return out
