"""The addict stub must reproduce REAL addict's persistence semantics.

The run-level oracle executes the reference CLI repeatedly in ONE process
against its module-global config tree. Real addict returns an empty child for
a missing key WITHOUT storing it (it hooks into the parent only when
something is assigned underneath). A persist-on-read stub silently poisoned
that global across scenarios: the reference's segmentation.save_model reads
`cfg.DOMAIN_ANALYSIS.DATASET.TRAIN`, and once that read materialized
DOMAIN_ANALYSIS, every later `train_segment` took the DOMAIN_ANALYSIS branch
and crashed on `cfg.LEARNING_RATE == {}` (full-suite scenario ordering,
2026-08-21). These checks pin the corrected semantics.
"""

from .torch_ref import stub_addict


def test_read_does_not_persist():
    stub_addict()
    from addict import Dict

    d = Dict({"a": {"b": 1}})
    assert d.a.b == 1
    assert d.MISSING == {} and "MISSING" not in d
    assert d.X.Y.Z == {} and "X" not in d  # deep reads stay unset


def test_write_persists_whole_chain():
    stub_addict()
    from addict import Dict

    d = Dict()
    d.P.Q.R = 5
    assert d["P"]["Q"]["R"] == 5 and d.P.Q.R == 5


def test_the_poisoning_sequence():
    # the exact reference access pattern that used to corrupt the global cfg
    stub_addict()
    from addict import Dict

    cfg = Dict({"LEARNING_RATE": {}, "DOMAIN_ANALYSIS": {}})
    assert cfg.DOMAIN_ANALYSIS == {}
    _ = cfg.DOMAIN_ANALYSIS.DATASET.TRAIN  # save_model's read (segmentation.py:144)
    assert cfg.DOMAIN_ANALYSIS == {}, "read must not materialize DATASET.TRAIN"
