"""Native threaded batch PNG loader vs serial decode."""

import numpy as np

from fft_restoration_tpu.utils.imageio import imread, imread_batch, imwrite


def test_imread_batch_matches_serial(tmp_path, rng):
    img = (rng.random((24, 36, 3)) * 255).astype(np.uint8)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"{i}.png")
        shifted = np.roll(img, i, axis=0)
        imwrite(p, shifted)
        paths.append(p)
    batch = imread_batch(paths, threads=3)
    assert batch.shape == (5, 24, 36, 3)
    for i, p in enumerate(paths):
        assert np.array_equal(batch[i], imread(p))


def test_imread_batch_empty():
    assert imread_batch([]).size == 0
