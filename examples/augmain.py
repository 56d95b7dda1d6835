"""Offline augmentation driver — the tpuseg equivalent of
`/root/reference/dataprocess/Augmain.py` (DataAug3D with ±10° rotations,
1% shifts, flips, ×10 copies per case), running the affine on device.

    python examples/augmain.py traindata.csv out_dir [aug_number]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuseg.data.augment3d import DataAug3D

if __name__ == "__main__":
    csv_path, out_dir = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    aug = DataAug3D(rotation=10.0, shift=0.01, flips=True, aug_number=n)
    out_csv = aug.run(csv_path, out_dir)
    print(f"augmented manifest: {out_csv}")
