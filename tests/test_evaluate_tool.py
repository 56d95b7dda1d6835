"""Test the offline 9-metric evaluation CLI."""
import os
import tempfile

import numpy as np

from tpuseg.data.geometry import Volume
from tpuseg.data.nifti import write_nifti
from tpuseg.tools.evaluate import evaluate_folders, main


def _write_case(d, name, arr, spacing=(1, 1, 1)):
    write_nifti(Volume(arr.astype(np.uint8), spacing=spacing), os.path.join(d, name))


def test_evaluate_folders_and_cli(rng, capsys):
    pred_d, gt_d = tempfile.mkdtemp(), tempfile.mkdtemp()
    gt = np.zeros((16, 16, 16), np.uint8)
    gt[4:12, 4:12, 4:12] = 1
    pred = np.zeros_like(gt)
    pred[5:13, 4:12, 4:12] = 1  # shifted by 1
    _write_case(gt_d, "case0.nii.gz", gt)
    _write_case(pred_d, "case0.nii.gz", pred)
    _write_case(gt_d, "case1.nii.gz", gt)
    _write_case(pred_d, "case1.nii.gz", gt)  # perfect

    results = dict(evaluate_folders(pred_d, gt_d))
    assert results["case1.nii.gz"]["dice"] == 1.0
    assert 0.5 < results["case0.nii.gz"]["dice"] < 1.0
    assert results["case0.nii.gz"]["assd"] > 0

    out_csv = os.path.join(tempfile.mkdtemp(), "eval.csv")
    main([pred_d, gt_d, out_csv])
    import pandas as pd

    df = pd.read_csv(out_csv)
    assert list(df["case"])[-1] == "MEAN"
    assert len(df) == 3
