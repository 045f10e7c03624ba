"""Unit tests for the reporting surface (reference test.py:251-403 protocol)."""
import csv

import numpy as np

from stereoanywhere_tpu.eval.report import append_csv, latex_row, run_tries


def test_run_tries_mean_std():
    vals = iter([{"bad 2.0": 0.10, "avgerr": 1.0}, {"bad 2.0": 0.20, "avgerr": 3.0}])
    mean, std = run_tries(lambda: next(vals), tries=2)
    np.testing.assert_allclose(mean["bad 2.0"], 0.15)
    np.testing.assert_allclose(mean["avgerr"], 2.0)
    np.testing.assert_allclose(std["avgerr"], 1.0)


def test_latex_row_scales_bad_metrics_to_percent():
    row = latex_row({"bad 2.0": 0.0696, "avgerr": 0.94}, ["bad 2.0", "avgerr"])
    assert row == r"6.96 & 0.94 \\"


def test_append_csv_header_once(tmp_path):
    path = str(tmp_path / "out.csv")
    append_csv(path, {"dataset": "middlebury", "bad 2.0": 0.07})
    append_csv(path, {"dataset": "eth3d", "bad 2.0": 0.02})
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert [r["dataset"] for r in rows] == ["middlebury", "eth3d"]
