"""Native C++ frame loader vs the Python OpenCV path: bit-parity and the
prefetcher contract."""
import os

import numpy as np
import pytest

from gsavatar import native

cv2 = pytest.importorskip("cv2")

H_RAW, W_RAW = 96, 80
H_OUT, W_OUT = 48, 40

K = np.array([[90.0, 0, 42.0], [0, 88.0, 47.0], [0, 0, 1]])
DIST = np.array([-0.02, 0.01, 0.001, -0.002, 0.005])


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    items = []
    for i in range(6):
        img = rng.integers(0, 255, (H_RAW, W_RAW, 3), np.uint8)
        mask = (rng.random((H_RAW, W_RAW)) > 0.5).astype(np.uint8) * 255
        ip = str(d / f"img{i}.png")
        mp = str(d / f"mask{i}.png")
        cv2.imwrite(ip, img)
        cv2.imwrite(mp, mask)
        items.append((ip, mp))
    return items


def _python_path(ip, mp, white_bg):
    from gsavatar.data.zju_format import load_image_mask
    return load_image_mask(ip, mp, K, DIST, (H_OUT, W_OUT),
                           (H_RAW, W_RAW), white_bg, use_native=False)


@pytest.mark.skipif(not native.available(), reason="libgsdata.so not built")
class TestNativeLoader:
    @pytest.mark.parametrize("white_bg", [False, True])
    def test_decode_frame_parity(self, frames, white_bg):
        ip, mp = frames[0]
        img_n, mask_n = native.decode_frame(ip, mp, K, DIST, (H_OUT, W_OUT),
                                            white_bg)
        img_p, mask_p = _python_path(ip, mp, white_bg)
        np.testing.assert_array_equal(mask_n, mask_p)
        np.testing.assert_allclose(img_n, img_p, atol=1e-6)

    def test_decode_batch_matches_single(self, frames):
        ips = [f[0] for f in frames]
        mps = [f[1] for f in frames]
        imgs, masks = native.decode_batch(ips, mps, K, DIST, (H_OUT, W_OUT),
                                          False, n_threads=3)
        assert imgs.shape == (6, H_OUT, W_OUT, 3)
        for i in (0, 3, 5):
            img1, mask1 = native.decode_frame(ips[i], mps[i], K, DIST,
                                              (H_OUT, W_OUT), False)
            np.testing.assert_array_equal(imgs[i], img1)
            np.testing.assert_array_equal(masks[i], mask1)

    def test_decode_frame_missing_file_raises(self, frames):
        with pytest.raises(IOError):
            native.decode_frame("/nonexistent.png", frames[0][1], K, DIST,
                                (H_OUT, W_OUT), False)

    def test_prefetcher_follows_schedule(self, frames):
        ips = [f[0] for f in frames]
        mps = [f[1] for f in frames]
        pf = native.Prefetcher(ips, mps, K, DIST, (H_OUT, W_OUT), False,
                               lookahead=3, n_threads=2)
        try:
            order = [4, 1, 0, 5, 2, 3]
            pf.set_schedule(order)
            seen = []
            while True:
                item = pf.next()
                if item is None:
                    break
                idx, img, mask = item
                seen.append(idx)
                ref_img, ref_mask = native.decode_frame(
                    ips[idx], mps[idx], K, DIST, (H_OUT, W_OUT), False)
                np.testing.assert_array_equal(img, ref_img)
            assert seen == order
            # second epoch with a fresh schedule
            pf.set_schedule([2, 0])
            assert pf.next()[0] == 2
            assert pf.next()[0] == 0
            assert pf.next() is None
        finally:
            pf.close()
