"""Frame sources for the real-time layer.

Parity: motion_display/{video_stream,camera_stream,charuco_stream}.py of the
reference. VideoStream (file playback + estimated intrinsics) is fully
functional; CameraStream (webcam) and ChArucoStream (ArUco-board camera
tracking) require a physical camera — they keep the same interface and fall
back cleanly when no device is present."""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

from gsavatar.camera.live import estimate_focal_length


class VideoStream:
    """Iterate frames of a video file with CLIFF-style intrinsics
    (video_stream.py:10-92)."""

    def __init__(self, path: str, focal: Optional[float] = None):
        import cv2
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise FileNotFoundError(path)
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.n_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        f = focal or estimate_focal_length(self.height, self.width)
        self.K = np.array([[f, 0, self.width / 2],
                           [0, f, self.height / 2], [0, 0, 1]], np.float32)

    def __len__(self):
        return self.n_frames

    def __iter__(self) -> Iterator[np.ndarray]:
        import cv2
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def release(self):
        self.cap.release()


class CameraStream:
    """Webcam source (camera_stream.py:41-97); requires a /dev/video device."""

    def __init__(self, device: int = 0, width: int = 1280, height: int = 720,
                 focal: Optional[float] = None):
        import cv2
        self.cap = cv2.VideoCapture(device)
        if not self.cap.isOpened():
            raise RuntimeError(f"no camera at index {device}")
        self.cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
        self.cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
        self.width, self.height = width, height
        f = focal or estimate_focal_length(height, width)
        self.K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                          np.float32)

    def __iter__(self):
        import cv2
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def release(self):
        self.cap.release()


class ChArucoStream:
    """ArUco GridBoard camera-pose tracking over a frame source
    (charuco_stream.py:31-82): detect markers, estimate the board pose, fall
    back to the last seen pose when detection fails."""

    def __init__(self, source, K: np.ndarray, dist=None,
                 markers_x: int = 5, markers_y: int = 7,
                 marker_len: float = 0.04, marker_sep: float = 0.01):
        import cv2
        self.source = source
        self.K = K
        self.dist = np.zeros(5, np.float32) if dist is None else dist
        adict = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_6X6_250)
        self.board = cv2.aruco.GridBoard(
            (markers_x, markers_y), marker_len, marker_sep, adict)
        self.detector = cv2.aruco.ArucoDetector(adict)
        self._last: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def detect(self, frame_rgb: np.ndarray):
        """Returns (R (3,3), T (3,)) of the camera w.r.t. the board, or the
        last pose when the board is not visible."""
        import cv2
        gray = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2GRAY)
        corners, ids, _ = self.detector.detectMarkers(gray)
        if ids is not None and len(ids) > 0:
            obj_pts, img_pts = self.board.matchImagePoints(corners, ids)
            if obj_pts is not None and len(obj_pts) >= 4:
                ok, rvec, tvec = cv2.solvePnP(obj_pts, img_pts, self.K,
                                              self.dist)
                if ok:
                    R, _ = cv2.Rodrigues(rvec)
                    self._last = (R, tvec.ravel())
        return self._last

    def __iter__(self):
        for frame in self.source:
            pose = self.detect(frame)
            yield frame, pose


def save_video_from_frames(frames, path: str, fps: float = 30.0):
    """utils/io_utils.py:4-16 equivalent."""
    import cv2
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), fps, (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
