"""Image output helpers."""
from __future__ import annotations

import numpy as np


def save_png(img, path: str) -> None:
    """Save an f32 [H, W, 3] (bottom-row-first, linear-ish display values in
    [0,1]) image as a PNG."""
    from PIL import Image
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr[::-1]).save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert('RGB'), np.float32)[::-1] / 255.0


def rel_mse(img, ref, eps: float = 1e-2) -> float:
    """Relative MSE — the fidelity metric from BASELINE.json: mean of
    (a-b)^2 / (ref^2 + eps)."""
    a = np.asarray(img, np.float64)
    b = np.asarray(ref, np.float64)
    return float(np.mean((a - b) ** 2 / (b * b + eps)))
