"""Tests: HTTP serving endpoint, 2D/3D augmentation, offline data prep."""
import io
import os
import tempfile
import threading

import numpy as np
import pytest

from tpuseg.data.geometry import Volume
from tpuseg.data.nifti import read_nifti, write_nifti


class _FakeModel:
    """inference() stub: threshold at volume mean."""

    def inference(self, vol, new_size):
        mask = (vol.array > vol.array.mean()).astype(np.uint8)
        out = Volume(mask)
        out.copy_geometry_from(vol)
        return out


def test_serving_roundtrip():
    from wsgiref.util import setup_testing_defaults
    from tpuseg.infer.serving import SegServer

    d = tempfile.mkdtemp()
    srv = SegServer(
        _FakeModel(), new_size=(8, 8, 8),
        upload_dir=os.path.join(d, "up"), result_dir=os.path.join(d, "res"),
        warmup=False,
    )
    vol = Volume(np.random.default_rng(0).random((8, 8, 8)).astype(np.float32))
    nii = os.path.join(d, "case.nii.gz")
    write_nifti(vol, nii)
    with open(nii, "rb") as f:
        payload = f.read()

    boundary = "XBOUNDARY"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="case.nii.gz"\r\n'
        f"Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()

    environ = {
        "REQUEST_METHOD": "POST",
        "PATH_INFO": "/predict",
        "CONTENT_TYPE": f"multipart/form-data; boundary={boundary}",
        "CONTENT_LENGTH": str(len(body)),
        "wsgi.input": io.BytesIO(body),
    }
    status_headers = {}

    def start_response(status, headers):
        status_headers["status"] = status

    resp = b"".join(srv(environ, start_response))
    assert status_headers["status"].startswith("200"), resp
    assert b"Segmentation Success" in resp

    # download it back
    import json

    name = json.loads(resp)["result"]
    environ = {
        "REQUEST_METHOD": "GET",
        "PATH_INFO": "/getresult",
        "QUERY_STRING": f"file={name}",
    }
    data = b"".join(srv(environ, start_response))
    assert status_headers["status"].startswith("200")
    out_path = os.path.join(d, "returned.nii.gz")
    with open(out_path, "wb") as f:
        f.write(data)
    back = read_nifti(out_path)
    assert back.array.shape == (8, 8, 8)
    assert set(np.unique(back.array)) <= {0, 1}


def test_augment3d_identity_bounds(rng):
    import jax
    from tpuseg.data.augment3d import Affine3DConfig, augment_volume

    img = rng.random((16, 16, 16)).astype(np.float32)
    msk = (img > 0.5).astype(np.uint8)
    cfg = Affine3DConfig(rotation_deg=(0, 0, 0), shift_frac=(0, 0, 0),
                         zoom_range=(1.0, 1.0), flip_axes=(False,) * 3)
    a_img, a_msk = augment_volume(jax.random.key(0), img, msk, cfg)
    np.testing.assert_allclose(np.asarray(a_img), img, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a_msk), msk)


def test_augment3d_changes_and_preserves_labels(rng):
    import jax
    from tpuseg.data.augment3d import Affine3DConfig, augment_volume

    img = rng.random((16, 16, 16)).astype(np.float32)
    msk = np.zeros((16, 16, 16), np.uint8)
    msk[4:12, 4:12, 4:12] = 3
    cfg = Affine3DConfig(rotation_deg=(15, 15, 15), shift_frac=(0.05,) * 3)
    a_img, a_msk = augment_volume(jax.random.key(1), img, msk, cfg)
    assert not np.allclose(np.asarray(a_img), img)
    assert set(np.unique(np.asarray(a_msk))) <= {0, 3}  # nearest keeps labels


def test_online_batch_augmenter(rng):
    from tpuseg.data.augment3d import make_batch_augmenter

    batch = {
        "image": rng.random((2, 8, 8, 8, 1)).astype(np.float32),
        "label": rng.integers(0, 2, (2, 8, 8, 8)).astype(np.int32),
    }
    aug = make_batch_augmenter(seed=3)
    out = aug(batch)
    assert out["image"].shape == batch["image"].shape
    assert out["label"].shape == batch["label"].shape
    assert out["label"].dtype == np.int32


def test_augment2d(rng):
    from tpuseg.data.augment2d import SegmentationAug2D

    img = (rng.random((32, 32)) * 255).astype(np.uint8)
    msk = np.zeros((32, 32), np.uint8)
    msk[8:24, 8:24] = 2
    aug = SegmentationAug2D(seed=0)
    a_img, a_msk = aug(img, msk)
    assert a_img.shape == img.shape
    assert set(np.unique(a_msk)) <= {0, 2}


def test_dataprep_pipeline(rng):
    import pandas as pd
    from tpuseg.tools.dataprep import prepare_sampling_3d, dataset_size_and_spacing

    d = tempfile.mkdtemp()
    imgs, msks = [], []
    for i in range(2):
        vol = Volume(rng.random((10, 12, 14)).astype(np.float32), spacing=(1, 1, 2))
        m = Volume((vol.array > 0.5).astype(np.uint8), spacing=(1, 1, 2))
        ip, mp = os.path.join(d, f"i{i}.nii.gz"), os.path.join(d, f"m{i}.nii.gz")
        write_nifti(vol, ip)
        write_nifti(m, mp)
        imgs.append(ip)
        msks.append(mp)
    csv = prepare_sampling_3d(imgs, msks, os.path.join(d, "prep"), (16, 16, 8))
    df = pd.read_csv(csv)
    assert len(df) == 2
    arr = np.load(df["Image"][0])
    assert arr.shape == (8, 16, 16)  # (z,y,x) of (16,16,8) xyz
    lab = np.load(df["Mask"][0])
    assert set(np.unique(lab)) <= {0, 1}
    size, spacing = dataset_size_and_spacing(imgs)
    np.testing.assert_allclose(size, (14, 12, 10))
    np.testing.assert_allclose(spacing, (1, 1, 2))
