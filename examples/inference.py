"""Batch folder inference entry point.

The tpuseg equivalent of `/root/reference/inference.py` (KiPA test set:
load MutilUNet3d weights, per NIfTI file run fixed-size inference, write
mask).  Driven by the config system.

    python examples/inference.py --infer.model_dir log/run \
        --model.name unet3d --model.num_classes 5 \
        --infer.new_size "[112,112,128]" <input_dir> <output_dir>
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuseg.config import parse_cli


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    paths = [a for a in argv if not a.startswith("--")]
    flags = [a for a in argv if a.startswith("--")]
    assert len(paths) == 2, "usage: inference.py [flags] <input_dir> <output_dir>"
    in_dir, out_dir = paths
    cfg = parse_cli(flags)

    import numpy as np

    from tpuseg.data.nifti import read_nifti, write_nifti
    from tpuseg.compat.seg_models import MutilUNet3dModel

    x, y, z = cfg.infer.new_size
    model = MutilUNet3dModel(
        z, y, x, cfg.model.image_channel, cfg.model.num_classes,
        batch_size=1, loss_name=cfg.train.loss_name,
        inference=True, model_path=cfg.infer.model_dir,
        features=cfg.model.features,
    )
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(
        f for f in os.listdir(in_dir) if f.endswith((".nii", ".nii.gz"))
    )
    for name in files:
        vol = read_nifti(os.path.join(in_dir, name))
        mask = model.inference(vol, tuple(cfg.infer.new_size))
        out_name = name.replace(".nii", "_mask.nii")
        write_nifti(mask, os.path.join(out_dir, out_name))
        print(f"{name}: mask labels {np.unique(mask.array)}")


if __name__ == "__main__":
    main()
