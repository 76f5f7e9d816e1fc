"""Tooling-layer tests: CLIFF crop math, rot6d, camera conversion, skeleton
overlay, and the dataset-build data transforms."""
import json
import os

import numpy as np
import pytest

from gsavatar.tooling import build_dataset, cliff, skeleton

cv2 = pytest.importorskip("cv2")


class TestCliffMath:
    def test_transform_roundtrip(self):
        center, scale, res = (120.0, 90.0), 1.3, (256, 192)
        pt = np.array([50, 70])
        fwd = cliff.transform(pt, center, scale, res)
        back = cliff.transform(fwd, center, scale, res, invert=True)
        assert np.abs(back - pt).max() <= 2  # rounding in both directions

    def test_bbox_from_detector(self):
        center, scale = cliff.bbox_from_detector([10, 20, 110, 220])
        np.testing.assert_allclose(center, [60.0, 120.0])
        # bbox_h=200 > bbox_w*4/3=133 -> scale = 200/200 * 1.1
        assert abs(scale - 1.1) < 1e-9

    def test_crop_shape_and_content(self):
        img = np.zeros((100, 100, 3), np.uint8)
        img[40:60, 40:60] = 255
        out, ul, br = cliff.crop(img, (50, 50), 0.5, (64, 48))
        assert out.shape == (64, 48, 3)
        assert out.max() == 255  # the white square lands in the crop

    def test_process_image_normalization(self):
        img = np.full((64, 64, 3), 128, np.uint8)
        norm, center, scale, ul, br, crop_img = cliff.process_image(
            img, None, crop_height=32, crop_width=24)
        assert norm.shape == (3, 32, 24)
        want = (128 / 255.0 - np.array(cliff.IMG_NORM_MEAN)) \
            / np.array(cliff.IMG_NORM_STD)
        got = norm[:, 16, 12]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rot6d_identity(self):
        # column-interleaved layout: a1=(x0,x2,x4), a2=(x1,x3,x5)
        x = np.array([[1.0, 0, 0, 1.0, 0, 0]])
        R = cliff.rot6d_to_rotmat(x)
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-7)

    def test_rot6d_orthonormal(self):
        rng = np.random.default_rng(0)
        R = cliff.rot6d_to_rotmat(rng.normal(size=(5, 6)))
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
            assert np.linalg.det(r) > 0.99

    def test_cam_crop2full(self):
        crop_cam = np.array([[1.0, 0.1, -0.2]])
        center = np.array([[320.0, 240.0]])
        scale = np.array([1.0])
        shape = np.array([[480, 640]])
        focal = np.array([800.0])
        full = cliff.cam_crop2full(crop_cam, center, scale, shape, focal)
        # tz = 2f/(200*s) = 8; tx/ty offsets from centered bbox
        np.testing.assert_allclose(full[0, 2], 8.0, rtol=1e-6)


class TestSkeleton:
    def test_draw_runs_both_topologies(self):
        img = np.zeros((100, 100, 3), np.uint8)
        kp = np.zeros((24, 3))
        kp[:, 0] = np.linspace(10, 90, 24)
        kp[:, 1] = np.linspace(10, 90, 24)
        kp[:, 2] = 1.0
        out = skeleton.draw_skeleton(img.copy(), kp)  # MPII (head-top conf)
        assert out.sum() > 0
        kp2 = kp.copy()
        kp2[13, 2] = 0.0
        out2 = skeleton.draw_skeleton(img.copy(), kp2)  # COCO
        assert out2.sum() > 0


class TestBuildDataset:
    def test_generate_camera_params(self, tmp_path):
        out = str(tmp_path / "cam_params.json")
        build_dataset.generate_camera_params(1920, 1080, out)
        with open(out) as f:
            data = json.load(f)
        K = np.asarray(data['1']['K'])
        f_est = (1920 ** 2 + 1080 ** 2) ** 0.5
        assert abs(K[0][0] - f_est) < 1e-3
        assert data['all_cam_names'] == ['1']

    def test_mask_to_yolo_txt_roundtrip(self, tmp_path):
        mask = np.zeros((64, 64), np.uint8)
        mask[10:40, 20:50] = 255
        mp = str(tmp_path / "m.png")
        cv2.imwrite(mp, mask)
        tp = str(tmp_path / "m.txt")
        recover = build_dataset.mask_to_yolo_txt(mp, tp)
        with open(tp) as f:
            lines = f.read().strip().splitlines()
        assert len(lines) == 1 and lines[0].startswith("0 ")
        # recovered polygon covers the original rectangle closely
        inter = ((recover > 0) & (mask > 0)).sum()
        assert inter / (mask > 0).sum() > 0.95

    def test_video_pipeline(self, tmp_path):
        vid = str(tmp_path / "v.mp4")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*'mp4v'), 10, (32, 32))
        rng = np.random.default_rng(0)
        for _ in range(20):
            w.write(rng.integers(0, 255, (32, 32, 3), np.uint8))
        w.release()
        out = str(tmp_path / "ds.mp4")
        kept = build_dataset.downsample_video(vid, out, every=5)
        assert kept == 4

        masks = np.zeros((4, 32, 32), bool)
        masks[1:, 8:24, 8:24] = True  # frame 0 empty -> skipped
        mp = str(tmp_path / "masks.npy")
        np.save(mp, masks)
        ds = str(tmp_path / "dataset")
        n = build_dataset.extract_images_and_masks(out, mp, ds)
        assert n == 3
        files = sorted(os.listdir(os.path.join(ds, '1')))
        assert "000001.jpg" in files and "000001.png" in files
        assert "000000.jpg" not in files

    def test_segment_video_gated(self):
        with pytest.raises(RuntimeError, match="ultralytics"):
            build_dataset.segment_video("x.mp4", "y.npy")
