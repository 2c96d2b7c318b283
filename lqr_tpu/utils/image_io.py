"""Host-side image file I/O (the GIMP file-plumbing stand-in)."""

from __future__ import annotations

import numpy as np


def load_image(path: str) -> np.ndarray:
    """Load an image file -> uint8 [h, w, c]. PNG/JPEG/... via PIL; PPM/PGM
    also readable without PIL if ever needed."""
    from PIL import Image as P
    img = P.open(path)
    if img.mode == "P":
        img = img.convert("RGBA" if "transparency" in img.info else "RGB")
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return np.ascontiguousarray(arr, np.uint8)


def save_image(path: str, arr: np.ndarray):
    from PIL import Image as P
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    mode = None
    if arr.ndim == 3:
        mode = {2: "LA", 3: "RGB", 4: "RGBA"}[arr.shape[2]]
    P.fromarray(arr, mode=mode).save(path)
