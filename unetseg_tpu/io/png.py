"""PNG I/O, parity with the reference's OpenCV usage.

The reference writes PNGs with compression level 0
(``src/preprocess.cpp:122``, ``src/process.cpp:236``) and reads them back
with IMREAD_ANYDEPTH|IMREAD_GRAYSCALE (``src/process.cpp:217``).  cv2 is the
same substrate; a PIL fallback keeps the framework importable without it.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAVE_CV2 = True
except ImportError:  # pragma: no cover
    _HAVE_CV2 = False
    from PIL import Image


def write_png(path: str, img: np.ndarray, compression=0) -> None:
    """compression=None writes with the encoder's defaults — byte parity
    with a bare ``cv::imwrite`` call (the reference's overlay write,
    src/mask2polygon.cpp:126; OpenCV's PNG default is level 1)."""
    img = np.asarray(img)
    if _HAVE_CV2:
        params = [] if compression is None else \
            [cv2.IMWRITE_PNG_COMPRESSION, compression]
        if not cv2.imwrite(path, img, params):
            raise RuntimeError(f"imwrite failed: {path}")
    else:  # pragma: no cover
        level = 1 if compression is None else compression
        if img.ndim == 3 and img.shape[2] == 3:
            # this module's 3-channel convention is BGR (cv2 parity);
            # PIL interprets arrays as RGB — swap or the saved overlay
            # has red/blue exchanged (round-4 review finding)
            img = img[..., ::-1]
        Image.fromarray(img).save(path, compress_level=level)


def read_png_gray(path: str) -> np.ndarray:
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise RuntimeError(f"Failed to read image: {path}")
        return img
    else:  # pragma: no cover
        im = Image.open(path)
        if im.mode in ("I", "I;16", "I;16B", "I;16L"):
            # preserve 16-bit depth like IMREAD_ANYDEPTH; convert('L')
            # would clamp to 8-bit (round-4 review finding)
            return np.asarray(im, dtype=np.uint16)
        return np.asarray(im.convert("L"))


def read_png_bgr(path: str) -> np.ndarray:
    """3-channel read as in create_overlay_image (src/mask2polygon.cpp:117)."""
    if _HAVE_CV2:
        img = cv2.imread(path)
        if img is None:
            raise RuntimeError(f"Failed to read image: {path}")
        return img
    else:  # pragma: no cover
        rgb = np.asarray(Image.open(path).convert("RGB"))
        return rgb[..., ::-1].copy()


def draw_contours_overlay(img_bgr: np.ndarray, contours, color=(0, 0, 255),
                          thickness: int = 1) -> np.ndarray:
    """Red contour overlay, parity with src/mask2polygon.cpp:114-129."""
    if _HAVE_CV2:
        cs = [np.asarray(c, np.int32).reshape(-1, 1, 2) for c in contours]
        cv2.drawContours(img_bgr, cs, -1, color, thickness)
        return img_bgr
    else:  # pragma: no cover
        # Minimal polyline fallback (Bresenham), closed polygons.
        for c in contours:
            pts = list(c)
            for (x0, y0), (x1, y1) in zip(pts, pts[1:] + pts[:1]):
                n = max(abs(x1 - x0), abs(y1 - y0), 1)
                for t in range(n + 1):
                    x = round(x0 + (x1 - x0) * t / n)
                    y = round(y0 + (y1 - y0) * t / n)
                    if 0 <= y < img_bgr.shape[0] and 0 <= x < img_bgr.shape[1]:
                        img_bgr[y, x] = color
        return img_bgr
