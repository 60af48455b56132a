"""Native C++ Poisson solver tests."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def clone_fn():
    try:
        from pix2latent_tpu.native import seamless_clone
        # force build
        seamless_clone(np.zeros((8, 8, 3), np.uint8),
                       np.zeros((8, 8, 3), np.uint8),
                       np.zeros((8, 8), np.uint8), (4, 4))
        return seamless_clone
    except Exception as e:  # toolchain missing
        pytest.skip(f"native build unavailable: {e}")


class TestSeamlessClone:
    def test_empty_mask_returns_dst(self, clone_fn):
        rng = np.random.RandomState(0)
        dst = rng.randint(0, 255, (16, 16, 3), np.uint8)
        src = rng.randint(0, 255, (16, 16, 3), np.uint8)
        out = clone_fn(src, dst, np.zeros((16, 16), np.uint8), (8, 8))
        np.testing.assert_array_equal(out, dst)

    def test_constant_regions_blend_smoothly(self, clone_fn):
        # src: bright object on dark; dst: mid-gray. After cloning, the
        # interior must keep src's (zero) gradients => approach dst's level.
        h = w = 32
        src = np.full((h, w, 3), 200, np.uint8)
        dst = np.full((h, w, 3), 100, np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[8:24, 8:24] = 1
        out = clone_fn(src, dst, mask, (16, 16), iters=2000)
        # boundary conditions come from dst; with constant src gradients the
        # solution is exactly dst's constant
        interior = out[12:20, 12:20]
        assert np.abs(interior.astype(int) - 100).max() <= 2

    def test_gradient_preservation(self, clone_fn):
        # src has a strong internal edge; the composite must keep it
        h = w = 32
        src = np.zeros((h, w, 3), np.uint8)
        src[:, :16] = 50
        src[:, 16:] = 200
        dst = np.full((h, w, 3), 120, np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[8:24, 8:24] = 1
        out = clone_fn(src, dst, mask, (16, 16), iters=2000)
        # the Poisson solution preserves the interior edge step (away from
        # the edge it relaxes toward the dst boundary values — correct)
        left = out[16, 16].astype(int)
        right = out[16, 17].astype(int)
        assert right[0] - left[0] > 80  # edge survived

    def test_translation_to_center(self, clone_fn):
        h = w = 40
        src = np.zeros((h, w, 3), np.uint8)
        src[2:10, 2:10] = 255
        dst = np.zeros((h, w, 3), np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[2:10, 2:10] = 1
        out = clone_fn(src, dst, mask, (30, 30), iters=1000)
        # the bright patch should now live near (30, 30)
        assert out[30, 30].max() > 50
        assert out[5, 5].max() == 0

    def test_shape_validation(self, clone_fn):
        with pytest.raises(AssertionError):
            clone_fn(np.zeros((8, 8, 3), np.uint8),
                     np.zeros((9, 9, 3), np.uint8),
                     np.zeros((9, 9), np.uint8), (4, 4))


class TestPoissonBlendIntegration:
    def test_image_utils_path(self, clone_fn):
        from pix2latent_tpu.utils.image import poisson_blend
        rng = np.random.RandomState(1)
        target = rng.rand(32, 32, 3).astype(np.float32)
        generated = rng.rand(32, 32, 3).astype(np.float32)
        mask = np.zeros((32, 32, 3), np.float32)
        mask[8:24, 8:24] = 1.0
        out = poisson_blend(target, mask, generated)
        assert out.shape == (32, 32, 3)
        assert out.dtype == np.uint8
