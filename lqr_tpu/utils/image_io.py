"""Host-side image file I/O (the GIMP file-plumbing stand-in).

PNG and binary PNM go through the native C++ codec
(native/imagecodec.cpp via utils/codec.py) — the data-path equivalent of
the reference's C pixel bridge (/root/reference/src/io_functions.c).
Everything else (JPEG, palette PNG, 16-bit, ...) falls back to PIL.
"""

from __future__ import annotations

import numpy as np


def load_image(path: str) -> np.ndarray:
    """Load an image file -> uint8 [h, w, c]."""
    if path.lower().endswith((".png", ".ppm", ".pgm", ".pnm")):
        try:
            from . import codec
            return codec.decode(open(path, "rb").read())
        except Exception:
            pass            # unsupported variant -> PIL below
    from PIL import Image as P
    img = P.open(path)
    if img.mode == "P":
        img = img.convert("RGBA" if "transparency" in img.info else "RGB")
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return np.ascontiguousarray(arr, np.uint8)


def save_image(path: str, arr: np.ndarray):
    arr = np.asarray(arr, np.uint8)
    low = path.lower()
    if low.endswith((".png", ".ppm", ".pgm", ".pnm")):
        try:
            from . import codec
            fmt = "png" if low.endswith(".png") else "pnm"
            with open(path, "wb") as f:
                f.write(codec.encode(arr, fmt))
            return
        except Exception:
            pass
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    mode = None
    if arr.ndim == 3:
        mode = {2: "LA", 3: "RGB", 4: "RGBA"}[arr.shape[2]]
    from PIL import Image as P
    P.fromarray(arr, mode=mode).save(path)
