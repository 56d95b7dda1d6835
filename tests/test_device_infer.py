"""Tests: device-side normalization and the fully-fused whole-volume
inference path vs the host pipeline."""
import numpy as np
import jax
import jax.numpy as jnp

from tpuseg.data.geometry import Volume
from tpuseg.data.normalize import percentile_zscore, truncate_and_normalize
from tpuseg.kernels.normalize import (
    percentile_zscore_device,
    truncate_and_normalize_device,
)


def test_percentile_zscore_device_matches_host(rng):
    x = (rng.random((20, 20, 20)) * 100).astype(np.float32)
    x[x < 10] = 0  # background zeros
    host = percentile_zscore(x)
    dev = np.asarray(percentile_zscore_device(jnp.asarray(x)))
    np.testing.assert_allclose(dev, host, atol=2e-3)


def test_percentile_zscore_device_all_zero():
    x = jnp.zeros((4, 4, 4))
    out = np.asarray(percentile_zscore_device(x))
    np.testing.assert_array_equal(out, np.zeros((4, 4, 4)))


def test_hu_window_device_matches_host(rng):
    x = (rng.random((8, 8, 8)) * 2000 - 1000).astype(np.float32)
    host = truncate_and_normalize(x, 100, -100, "meanstd")
    dev = np.asarray(truncate_and_normalize_device(jnp.asarray(x), 100, -100))
    np.testing.assert_allclose(dev, host, atol=1e-4)
    host2 = truncate_and_normalize(x, 100, -100, "maxmin")
    dev2 = np.asarray(
        truncate_and_normalize_device(jnp.asarray(x), 100, -100, "maxmin")
    )
    np.testing.assert_allclose(dev2, host2, atol=1e-5)


def test_infer_volume_device_matches_host_pipeline(rng):
    """The fused device path produces the same mask as the host
    resample→normalize→forward→resample pipeline."""
    from tpuseg.infer.volume import infer_volume, infer_volume_device
    from tpuseg.models.unet import UNet

    model = UNet(ndim=3, num_classes=2, features=8, dropout=0.0)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))

    src = Volume(
        (rng.random((20, 24, 28)) * 50).astype(np.float32),
        origin=(1, 2, 3), spacing=(0.9, 1.1, 1.3),
    )

    def forward(batch):
        _, probs = model.apply(params, jnp.asarray(batch))
        return probs

    host_mask = infer_volume(src, forward, (16, 16, 16), num_classes=2)
    dev_mask = infer_volume_device(src, model, params, (16, 16, 16), 2)
    assert dev_mask.array.shape == src.array.shape
    assert dev_mask.GetSpacing() == src.GetSpacing()
    # identical pipelines up to resampling interpolation details: demand
    # near-total agreement
    agree = (dev_mask.array == host_mask.array).mean()
    assert agree > 0.99, agree
