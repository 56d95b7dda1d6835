"""Offline evaluation CLI: the 9-metric report over prediction/GT folders.

The reference computes Seg_Metirc3d per case in ad-hoc scripts; tpuseg
ships it as a tool: paired NIfTI masks → per-case + mean metrics CSV.

    python -m tpuseg.tools.evaluate <pred_dir> <gt_dir> [out.csv] [--label K]
"""
from __future__ import annotations

import os
import sys

import numpy as np

from tpuseg.data.nifti import read_nifti
from tpuseg.metrics.seg3d import SegMetric3d

METRIC_KEYS = ["dice", "jaccard", "voe", "rvd", "fnr", "fpr", "assd", "rmsd", "msd"]


def evaluate_folders(pred_dir: str, gt_dir: str, label: int = 0):
    """Yield (case_name, metrics_dict) for files present in both folders.

    ``label``: evaluate a single label as binary (0 = any foreground).
    """
    names = sorted(
        f for f in os.listdir(pred_dir)
        if f.endswith((".nii", ".nii.gz")) and os.path.isfile(os.path.join(gt_dir, f))
    )
    for name in names:
        pred = read_nifti(os.path.join(pred_dir, name))
        gt = read_nifti(os.path.join(gt_dir, name))
        p = np.asarray(pred.array)
        g = np.asarray(gt.array)
        if label:
            p, g = (p == label), (g == label)
        else:
            p, g = (p != 0), (g != 0)
        if g.sum() == 0:
            continue
        m = SegMetric3d(g.astype(np.uint8), p.astype(np.uint8), gt.GetSpacing())
        yield name, m.all_metrics()


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    label = 0
    if "--label" in argv:
        i = argv.index("--label")
        label = int(argv[i + 1])
        del argv[i:i + 2]
    pred_dir, gt_dir = argv[0], argv[1]
    out_csv = argv[2] if len(argv) > 2 else "evaluation.csv"

    import pandas as pd

    rows = []
    for name, metrics in evaluate_folders(pred_dir, gt_dir, label):
        rows.append({"case": name, **metrics})
        print(name, " ".join(f"{k}={metrics[k]:.4f}" for k in ("dice", "assd", "msd")))
    df = pd.DataFrame(rows)
    if len(df):
        mean = {"case": "MEAN", **{k: df[k].mean() for k in METRIC_KEYS}}
        df = pd.concat([df, pd.DataFrame([mean])], ignore_index=True)
    df.to_csv(out_csv, index=False)
    print(f"wrote {out_csv} ({len(df)} rows)")


if __name__ == "__main__":
    main()
