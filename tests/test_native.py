"""Native C++ host ops vs numpy reference implementations."""

import numpy as np
import pytest

from vaeunet_tpu import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native library failed to build")
    return True


def test_gather_patch_batch_matches_numpy(built):
    rng = np.random.RandomState(0)
    images = [np.ascontiguousarray(rng.randint(0, 256, (40, 50, 3), np.uint8))
              for _ in range(5)]
    masks = [np.ascontiguousarray(rng.randint(0, 2, (40, 50), np.uint8) * 255)
             for _ in range(5)]
    coords = np.stack([rng.randint(0, 20, 5), rng.randint(0, 30, 5)], 1)
    imgs, msks = native.gather_patch_batch(images, masks,
                                           coords.astype(np.int32), 16)
    assert imgs.shape == (5, 16, 16, 3) and msks.shape == (5, 16, 16, 1)
    for i in range(5):
        y, x = coords[i]
        np.testing.assert_array_equal(
            imgs[i], images[i][y:y + 16, x:x + 16].astype(np.float32) / 255.0)
        np.testing.assert_array_equal(
            msks[i][..., 0],
            (masks[i][y:y + 16, x:x + 16] > 0).astype(np.float32))


def test_feathered_blend_matches_numpy(built):
    rng = np.random.RandomState(1)
    tiles = rng.rand(4, 8, 8).astype(np.float32)
    weights = rng.rand(4, 8, 8).astype(np.float32) + 0.1
    coords = np.asarray([[0, 0], [0, 6], [5, 0], [5, 6]], np.int32)
    out = native.feathered_blend(tiles, weights, coords, (16, 16))
    ref_o = np.zeros((16, 16), np.float32)
    ref_w = np.zeros((16, 16), np.float32)
    for t in range(4):
        y, x = coords[t]
        ref_o[y:y + 8, x:x + 8] += tiles[t] * weights[t]
        ref_w[y:y + 8, x:x + 8] += weights[t]
    np.testing.assert_allclose(out, ref_o / (ref_w + 1e-8), atol=1e-6)


def test_native_resize_matches_numpy_reference(built):
    from vaeunet_tpu.data.dataset import _resize_bilinear_np
    rng = np.random.RandomState(2)
    img = rng.rand(37, 53, 3).astype(np.float32)
    ours = native.resize_bilinear(img, (20, 30))
    ref = _resize_bilinear_np(img, (20, 30))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gather_is_threadsafe_consistent(built):
    """Same inputs across thread counts -> identical outputs."""
    rng = np.random.RandomState(3)
    images = [np.ascontiguousarray(rng.randint(0, 256, (64, 64, 3), np.uint8))
              for _ in range(16)]
    masks = [np.ascontiguousarray(rng.randint(0, 2, (64, 64), np.uint8))
             for _ in range(16)]
    coords = np.stack([rng.randint(0, 32, 16), rng.randint(0, 32, 16)],
                      1).astype(np.int32)
    a, am = native.gather_patch_batch(images, masks, coords, 32, num_threads=1)
    b, bm = native.gather_patch_batch(images, masks, coords, 32, num_threads=8)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(am, bm)
