"""Offline data preparation pipeline (the reference's L0 layer).

Capability parity with `/root/reference/dataprocess/data3dpreparewithSize.py`
(preparesampling3dtraindata: resample image linear / mask nearest to a
fixed size, percentile z-score, dump .npy pairs + CSV manifest),
`dataprocess/utils.py:221-279` (file_name_path dir walker, save_file2csv
manifest writers) and `dataAnaly.py` (mean size/spacing stats).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tpuseg.data.geometry import resample_to_size
from tpuseg.data.nifti import read_nifti
from tpuseg.data.normalize import percentile_zscore


def file_name_path(file_dir: str, return_dirs: bool = True, return_files: bool = False):
    """`utils.py:221`: list sub-directories or files of a directory."""
    for root, dirs, files in os.walk(file_dir):
        if return_dirs and len(dirs):
            return sorted(dirs)
        if return_files and len(files):
            return sorted(files)
        return []
    return []


def save_file2csv(file_dir: str, out_csv: str, image_name="image.nii.gz",
                  mask_name="mask.nii.gz"):
    """`utils.py:236`: write an Image,Mask manifest over case directories."""
    import pandas as pd

    cases = file_name_path(file_dir, True, False)
    rows = [
        (os.path.join(file_dir, c, image_name), os.path.join(file_dir, c, mask_name))
        for c in cases
    ]
    pd.DataFrame(rows, columns=["Image", "Mask"]).to_csv(out_csv, index=False)
    return out_csv


def save_file2csvclassify(file_dir: str, out_csv: str):
    """`utils.py:258`: label,path manifest for class-per-folder layouts."""
    import pandas as pd

    rows = []
    for label, cls in enumerate(file_name_path(file_dir, True, False)):
        cls_dir = os.path.join(file_dir, cls)
        for f in sorted(os.listdir(cls_dir)):
            rows.append((label, os.path.join(cls_dir, f)))
    pd.DataFrame(rows, columns=["label", "path"]).to_csv(out_csv, index=False)
    return out_csv


def prepare_sampling_3d(
    image_paths: Sequence[str],
    mask_paths: Sequence[str],
    out_dir: str,
    target_size_xyz: Tuple[int, int, int] = (112, 112, 128),
    normalize=percentile_zscore,
) -> str:
    """`data3dpreparewithSize.py:12` preparesampling3dtraindata."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for i, (ip, mp) in enumerate(zip(image_paths, mask_paths)):
        img = resample_to_size(read_nifti(ip), target_size_xyz, "linear")
        msk = resample_to_size(read_nifti(mp), target_size_xyz, "nearest")
        arr = normalize(img.array)
        stem = f"case_{i:04d}"
        ipath = os.path.join(out_dir, stem + "_img.npy")
        mpath = os.path.join(out_dir, stem + "_msk.npy")
        np.save(ipath, arr.astype(np.float32))
        np.save(mpath, msk.array.astype(np.uint8))
        rows.append((ipath, mpath))
    out_csv = os.path.join(out_dir, "traindata.csv")
    pd.DataFrame(rows, columns=["Image", "Mask"]).to_csv(out_csv, index=False)
    return out_csv


def dataset_size_and_spacing(image_paths: Sequence[str]):
    """`dataAnaly.py:10` getImageSizeandSpacing: mean size & spacing."""
    sizes, spacings = [], []
    for p in image_paths:
        vol = read_nifti(p)
        sizes.append(vol.GetSize())
        spacings.append(vol.GetSpacing())
    return (
        tuple(np.mean(np.asarray(sizes), axis=0)),
        tuple(np.mean(np.asarray(spacings), axis=0)),
    )
