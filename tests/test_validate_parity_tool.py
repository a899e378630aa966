"""tools/validate_parity.py — the one-command 0.5% top-k gate — must run
end-to-end dataset-free so the recipe cannot rot before real data arrives
(VERDICT r1 #3: the tool previously had no test at all)."""

import json
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_validate_parity_synthetic_small(tmp_path, capsys, monkeypatch):
    sys.path.insert(0, "/root/repo")
    import tools.validate_parity as vp

    # fake reference CSV in the torch layout (4 rows x 4 k-thresholds, %)
    ref_csv = tmp_path / "ref.csv"
    np.savetxt(ref_csv, np.full((4, 4), 50.0), fmt="%02.2f", delimiter="\t")

    rc = vp.main([
        "--synthetic", "--small", "--profiles", "exact", "serving",
        "--first_n_withvideo", "3", "--reference_csv", str(ref_csv),
    ])
    out = capsys.readouterr().out
    # machine-readable line parses and contains every profile + the reference
    [jline] = [l for l in out.splitlines() if l.startswith("PARITY_JSON ")]
    payload = json.loads(jline[len("PARITY_JSON "):])
    assert set(payload) == {"exact", "serving", "reference"}
    for prof in payload.values():
        assert set(prof) == {"top1_single", "top1_avg_desc", "top1_aggr_desc"}
        assert all(0.0 <= v <= 1.0 for v in prof.values())
    assert payload["reference"]["top1_single"] == 0.5
    # gate lines printed for serving-vs-exact and exact-vs-reference
    assert "serving vs exact top1_single: delta" in out
    assert "exact vs reference top1_single: delta" in out
    # NOTE: no serving-vs-exact accuracy assertion here — with RANDOM
    # weights, near-tie NMS ordering flips between numerically-different
    # backends, and one flipped query on a 9-query fixture is 11%.  The
    # backend equivalence gate is regression-tested at op/descriptor level
    # (tests/test_pallas_roi_align.py); with real weights the tool's gate
    # lines carry the signal.
    assert rc in (0, 1)  # gate verdict depends on the fake reference values


def test_build_config_profiles():
    import tools.validate_parity as vp

    exact = vp.build_config("exact", small=False)
    serving = vp.build_config("serving", small=False)
    fast = vp.build_config("fast", small=False)
    assert exact.roi_heads.roi_align_backend == "xla"
    assert serving.roi_heads.roi_align_backend == "pallas_resident"
    assert fast.rpn.post_nms_top_n_test == 1000
    small = vp.build_config("serving", small=True)
    assert small.transform.min_size == 96
    with pytest.raises(SystemExit):
        vp.build_config("bogus", small=False)


def test_reference_csv_row_mapping(tmp_path):
    import tools.validate_parity as vp

    perf = np.asarray([[10.0, 20, 30, 40],    # single
                       [11.0, 21, 31, 41],    # product max
                       [12.0, 22, 32, 42],    # avg desc
                       [13.0, 23, 33, 43]])   # aggr desc
    path = tmp_path / "r.csv"
    np.savetxt(path, perf, fmt="%02.2f", delimiter="\t")
    got = vp.load_reference_csv(str(path))
    assert got == {"top1_single": 0.1, "top1_avg_desc": 0.12,
                   "top1_aggr_desc": 0.13}
