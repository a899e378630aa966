"""CLI argument-surface smoke tests (behavioral flags).

Default *values* are pinned against the reference-passed table in
tests/test_cli_defaults.py — keep only flag-plumbing checks here."""

from seam_match_rcnn_tpu.cli.evaluate_movingfashion import build_argparser as eval_mf
from seam_match_rcnn_tpu.cli.evaluate_multidf2 import build_argparser as eval_mdf2
from seam_match_rcnn_tpu.cli.train_movingfashion import build_argparser as train_mf
from seam_match_rcnn_tpu.cli.train_multidf2 import build_argparser as train_mdf2


def test_flag_overrides_parse():
    a = train_mf().parse_args(["--lr", "0.01", "--milestones", "5", "10",
                               "--n_shops", "4"])
    assert a.lr == 0.01 and a.milestones == [5, 10] and a.n_shops == 4


def test_device_ingest_flag_all_clis():
    """--device_ingest selects the TPU-fused resize ingest (PERF.md lever 6)
    on both eval CLIs and both phase-2 train CLIs; default stays host."""
    for bp in (train_mf, train_mdf2, eval_mf, eval_mdf2):
        assert bp().parse_args([]).device_ingest is False
        assert bp().parse_args(["--device_ingest"]).device_ingest is True


def test_evalconfig_ingest_reaches_runner(monkeypatch):
    """evaluate() forwards EvalConfig.ingest to its default InferenceRunner."""
    from seam_match_rcnn_tpu.config import EvalConfig
    from seam_match_rcnn_tpu.eval import movingfashion as mf_eval
    from seam_match_rcnn_tpu.eval import runner as runner_mod

    captured = {}

    class FakeRunner:
        def __init__(self, model, variables, **kw):
            captured.update(kw)
            raise RuntimeError("stop after construction")

    monkeypatch.setattr(runner_mod, "InferenceRunner", FakeRunner)
    try:
        mf_eval.evaluate(None, {"params": {}},
                         products=[], cfg=EvalConfig(ingest="device"))
    except (RuntimeError, KeyError):
        pass
    assert captured.get("ingest") == "device"


def test_phase1_train_roi_backend_default():
    """Phase-1 trains through the tile-resident RoIAlign by default — the
    choice settled by the on-chip train-step A/B (PERF.md round 4:
    pallas_resident 13.25 > pallas 13.13 > xla 9.65 images/sec/chip), and
    the resident forward's ~9x HBM-byte reduction is the lever on
    production v5e.  Not a reference-table value (the reference has no
    backend knob), hence pinned here rather than test_cli_defaults."""
    from seam_match_rcnn_tpu.cli.train_matchrcnn import (
        build_argparser as train_mrcnn)

    a = train_mrcnn().parse_args([])
    assert a.roi_backend == "pallas_resident"
    assert a.exact_roi_align is False


def test_roi_adjoint_backend_default():
    """The RoIAlign BACKWARD defaults to the tile-resident adjoint kernel
    — settled by the round-5 on-chip A/B (full production step 168 vs
    249 ms, PERF.md round 5); 'xla' remains the scatter-add escape
    hatch.  Precision follows the forward's rule (f32 -> bit-matching
    summands; bf16 -> single bf16 MXU passes)."""
    from seam_match_rcnn_tpu.config import RoIHeadsConfig

    assert RoIHeadsConfig().roi_adjoint_backend == "pallas"


def test_noise_flag_parses_false():
    """type=bool in the reference makes '--noise False' parse as True
    (train_movingfashion.py:171) — documented bug, not copied: our CLIs
    accept real booleans."""
    from seam_match_rcnn_tpu.cli.evaluate_movingfashion import (
        build_argparser as eval_mf)
    from seam_match_rcnn_tpu.cli.train_movingfashion import (
        build_argparser as train_mf)
    from seam_match_rcnn_tpu.cli.train_multidf2 import (
        build_argparser as train_mdf2)

    for bp in (eval_mf, train_mf, train_mdf2):
        assert bp().parse_args([]).noise is True
        assert bp().parse_args(["--noise", "False"]).noise is False
        assert bp().parse_args(["--noise", "0"]).noise is False
        assert bp().parse_args(["--noise", "true"]).noise is True
