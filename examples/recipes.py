"""Runnable recipes — the tpuseg equivalent of `/root/reference/example.py`
(all 13 of its train/inference recipes across Binary/Mutil × UNet/VNet ×
2d/3d plus MNIST-style ResNet2d classification, same names, plus GAN and
registration recipes the reference's example.py lacks).

Each recipe mirrors the reference entry of the same name; data paths are
CSV manifests in the reference's formats (Image,Mask or label,path).
Pass the recipe name and manifests:

    python examples/recipes.py trainbinaryunet2d train.csv val.csv log/b2d
    python examples/recipes.py trainmutilunet3d  train.csv val.csv log/m3d
    python examples/recipes.py trainmutilresnet2d train.csv val.csv log/cls
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuseg.data.dataset import read_manifest_csv


def _seg_model(cls, size, channels, classes, loss, batch):
    return cls(*size, channels, classes, batch_size=batch, loss_name=loss)


def trainbinaryunet2d(train_csv, val_csv, model_dir, epochs=50):
    """`example.py` binary UNet2d, 512x512, dice+BCE."""
    from tpuseg.compat import BinaryUNet2dModel

    ti, tl = read_manifest_csv(train_csv)
    vi, vl = read_manifest_csv(val_csv)
    m = BinaryUNet2dModel(512, 512, 1, 1, 8, "BinaryCrossEntropyDiceLoss")
    m.trainprocess(ti, tl, vi, vl, model_dir, epochs=epochs)


def trainbinaryvnet2d(train_csv, val_csv, model_dir, epochs=50):
    """`example.py:16` trainbinaryvnet2d."""
    from tpuseg.compat import BinaryVNet2dModel

    ti, tl = read_manifest_csv(train_csv)
    vi, vl = read_manifest_csv(val_csv)
    m = BinaryVNet2dModel(512, 512, 1, 1, 8, "BinaryDiceLoss")
    m.trainprocess(ti, tl, vi, vl, model_dir, epochs=epochs)


def trainmutilunet2d(train_csv, val_csv, model_dir, epochs=50):
    """`example.py:61` trainmutilunet2d: 512x512, 2 classes, MutilDiceLoss."""
    from tpuseg.compat import MutilUNet2dModel

    ti, tl = read_manifest_csv(train_csv)
    vi, vl = read_manifest_csv(val_csv)
    m = MutilUNet2dModel(512, 512, 1, 2, 8, "MutilDiceLoss")
    m.trainprocess(ti, tl, vi, vl, model_dir, epochs=epochs)


def trainmutilvnet2d(train_csv, val_csv, model_dir, epochs=50):
    """`example.py:46` trainmutilvnet2d: 512x512, 2 classes, MutilDiceLoss."""
    from tpuseg.compat import MutilVNet2dModel

    ti, tl = read_manifest_csv(train_csv)
    vi, vl = read_manifest_csv(val_csv)
    m = MutilVNet2dModel(512, 512, 1, 2, 8, "MutilDiceLoss")
    m.trainprocess(ti, tl, vi, vl, model_dir, epochs=epochs)


def trainbinaryunet3d(train_csv, val_csv, model_dir, epochs=100):
    """`example.py:92` trainbinaryunet3d."""
    from tpuseg.compat import BinaryUNet3dModel

    ti, tl = read_manifest_csv(train_csv)
    vi, vl = read_manifest_csv(val_csv)
    m = BinaryUNet3dModel(96, 96, 96, 1, 1, 1, "BinaryDiceLoss")
    m.trainprocess(ti, tl, vi, vl, model_dir, epochs=epochs, showwind=[12, 8])


def trainmutilunet3d(train_csv, val_csv, model_dir, epochs=100):
    """`train.py:13` KiPA2022: 112x112x128, 5 classes, MutilDiceLoss."""
    from tpuseg.compat import MutilUNet3dModel

    ti, tl = read_manifest_csv(train_csv)
    vi, vl = read_manifest_csv(val_csv)
    m = MutilUNet3dModel(128, 112, 112, 1, 5, 1, "MutilDiceLoss")
    m.trainprocess(ti, tl, vi, vl, model_dir, epochs=epochs, showwind=[16, 8])


def trainmutilvnet3d(train_csv, val_csv, model_dir, epochs=100):
    """`example.py:118` Amos2022: 80x112x176, 16 classes."""
    from tpuseg.compat import MutilVNet3dModel

    ti, tl = read_manifest_csv(train_csv)
    vi, vl = read_manifest_csv(val_csv)
    m = MutilVNet3dModel(176, 112, 80, 1, 16, 1, "MutilDiceLoss")
    m.trainprocess(ti, tl, vi, vl, model_dir, epochs=epochs, showwind=[16, 11])


def trainbinaryvnet3d(train_csv, val_csv, model_dir, epochs=100):
    from tpuseg.compat import BinaryVNet3dModel

    ti, tl = read_manifest_csv(train_csv)
    vi, vl = read_manifest_csv(val_csv)
    m = BinaryVNet3dModel(96, 96, 96, 1, 1, 1, "BinaryDiceLoss")
    m.trainprocess(ti, tl, vi, vl, model_dir, epochs=epochs, showwind=[12, 8])


def trainmutilresnet2d(train_csv, val_csv, model_dir, epochs=50):
    """`example.py:204` MNIST-style classification (label,path CSV)."""
    import pandas as pd

    from tpuseg.compat import MutilResNet2dModel

    tdf, vdf = pd.read_csv(train_csv), pd.read_csv(val_csv)
    m = MutilResNet2dModel(28, 28, 1, 10, 64, "MutilCrossEntropyLoss")
    m.trainprocess(
        list(tdf["path"]), list(tdf["label"]),
        list(vdf["path"]), list(vdf["label"]), model_dir, epochs=epochs,
    )


def trainpix2pixgan2d(train_csv, val_csv, model_dir, epochs=100):
    """`modelPixel2PixelGAN.py` image-to-image GAN (Image,Target CSV)."""
    from tpuseg.compat import Pixel2PixelGAN2dModel

    ti, tt = read_manifest_csv(train_csv)
    vi, vt = read_manifest_csv(val_csv)
    m = Pixel2PixelGAN2dModel(256, 256, 1, 1, batch_size=4)
    m.trainprocess(ti, tt, vi, vt, model_dir, epochs=epochs)


def trainregistration3d(train_csv, val_csv, model_dir, epochs=100):
    """VNet3dRegistration: CSV rows are moving_image,fixed_image .npy
    volume pairs (labels optional, same stem + '_label')."""
    import numpy as np

    from tpuseg.data.dataset import ArrayDataset, DataLoader
    from tpuseg.tasks.registration import make_registration_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    def load(csv):
        mi, fi = read_manifest_csv(csv)
        samples = []
        for m_, f_ in zip(mi, fi):
            mov = np.load(m_).astype(np.float32)[..., None]
            fix = np.load(f_).astype(np.float32)[..., None]
            samples.append({
                "moving_image": mov, "fixed_image": fix,
                "moving_label": (mov > mov.mean()).astype(np.float32),
                "fixed_label": (fix > fix.mean()).astype(np.float32),
            })
        return ArrayDataset(samples)

    train = DataLoader(load(train_csv), batch_size=1, shuffle=True)
    val = DataLoader(load(val_csv), batch_size=1)
    shape = train.dataset[0]["moving_image"].shape
    trainer = make_registration_trainer(
        example_shape=(1, *shape), seg_weight=0.5,
        config=TrainerConfig(epochs=epochs, lr=1e-3, optimizer="adam"),
    )
    trainer.fit(lambda: iter(train), lambda: iter(val), model_dir)


def inferencebinaryvnet2d(model_dir, in_csv, out_dir):
    """`example.py:140`: per-image 2D inference, masks written as png."""
    import cv2

    from tpuseg.compat import BinaryVNet2dModel

    images, _ = read_manifest_csv(in_csv)
    m = BinaryVNet2dModel(512, 512, 1, 1, 8, "BinaryDiceLoss",
                          inference=True, model_path=model_dir)
    os.makedirs(out_dir, exist_ok=True)
    for index, path in enumerate(images):
        mask = m.inference(cv2.imread(path, 0))
        cv2.imwrite(os.path.join(out_dir, f"{index}.png"), mask * 255)


def inferencemutilvnet2d(model_dir, in_csv, out_dir):
    """`example.py:156`: per-image 2D multiclass inference."""
    import cv2

    from tpuseg.compat import MutilVNet2dModel

    images, _ = read_manifest_csv(in_csv)
    m = MutilVNet2dModel(512, 512, 1, 2, 8, "MutilDiceLoss",
                         inference=True, model_path=model_dir)
    os.makedirs(out_dir, exist_ok=True)
    for index, path in enumerate(images):
        mask = m.inference(cv2.imread(path, 0))
        cv2.imwrite(os.path.join(out_dir, f"{index}.png"), mask)


def _folder_inference_3d(model, in_dir, out_dir, new_size_xyz):
    from tpuseg.data.nifti import read_nifti, write_nifti

    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(os.listdir(in_dir)):
        if not name.endswith((".nii", ".nii.gz")):
            continue
        mask = model.inference(read_nifti(os.path.join(in_dir, name)), new_size_xyz)
        write_nifti(mask, os.path.join(out_dir, name.replace(".nii", "_mask.nii")))


def inferencebinaryvnet3d(model_dir, in_dir, out_dir):
    """`example.py:172`: Amos2022 folder inference, binary VNet3d at
    80x112x176 (newSize xyz = 176,112,80)."""
    from tpuseg.compat import BinaryVNet3dModel

    m = BinaryVNet3dModel(80, 112, 176, 1, 1, 1, "BinaryDiceLoss",
                          inference=True, model_path=model_dir)
    _folder_inference_3d(m, in_dir, out_dir, (176, 112, 80))


def inferencemutilvnet3d(model_dir, in_dir, out_dir):
    """`example.py:188`: Amos2022 folder inference, 16-class VNet3d."""
    from tpuseg.compat import MutilVNet3dModel

    m = MutilVNet3dModel(80, 112, 176, 1, 16, 1, "MutilFocalLoss",
                         inference=True, model_path=model_dir)
    _folder_inference_3d(m, in_dir, out_dir, (176, 112, 80))


# the reference spells this one with capital RN (`example.py:204`)
def trainmutilResNet2d(*args, **kw):
    return trainmutilresnet2d(*args, **kw)


RECIPES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and (name.startswith("train") or name.startswith("inference"))
}

if __name__ == "__main__":
    recipe = sys.argv[1]
    RECIPES[recipe](*sys.argv[2:])
