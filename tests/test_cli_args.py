"""CLI argument-surface smoke tests: flags mirror the reference defaults."""

from seam_match_rcnn_tpu.cli.evaluate_movingfashion import build_argparser as eval_mf
from seam_match_rcnn_tpu.cli.evaluate_multidf2 import build_argparser as eval_mdf2
from seam_match_rcnn_tpu.cli.train_matchrcnn import build_argparser as train_p1
from seam_match_rcnn_tpu.cli.train_movingfashion import build_argparser as train_mf
from seam_match_rcnn_tpu.cli.train_multidf2 import build_argparser as train_mdf2


def test_train_matchrcnn_defaults():
    a = train_p1().parse_args([])
    assert a.lr == 0.02 and a.momentum == 0.9
    assert a.milestones == [6, 9] and a.epochs == 12 and a.save_epochs == 2


def test_train_movingfashion_defaults():
    a = train_mf().parse_args([])
    assert a.lr == 0.04 and a.w_decay == 5e-4
    assert a.milestones == [15, 25] and a.epochs == 31
    assert a.n_shops == 16 and a.frames_per_shop_train == 10
    assert a.score_thresh == 0.7 and a.eval_freq == 4


def test_train_multidf2_defaults():
    a = train_mdf2().parse_args([])
    assert a.n_shops == 8 and a.lr == 0.04


def test_eval_defaults():
    a = eval_mf().parse_args([])
    assert a.frames_per_shop_test == 10 and a.first_n_withvideo == 100
    assert a.score_threshold == 0.0
    b = eval_mdf2().parse_args([])
    assert b.frames_per_shop_test == 10


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
