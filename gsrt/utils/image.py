"""Image IO and quality metrics.

Replaces the reference's image.binary dump + dump_image.sh reconstruction
(vulkan_ray_tracing.cc:2135+, SURVEY.md §4) with direct PNG output, and
adds the PSNR/SSIM comparison required by the north-star target.
"""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img) -> None:
    from PIL import Image
    arr = to_uint8(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    Image.fromarray(arr).save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def dump_image_binary(path: str, img) -> None:
    """Reference-compatible dump: per pixel, RGB bytes + linear offset
    (vulkan_ray_tracing.cc image_store → image.binary)."""
    arr = to_uint8(img)
    if arr.ndim == 2:          # grayscale, like save_png accepts
        arr = np.repeat(arr[..., None], 3, axis=-1)
    h, w = arr.shape[:2]
    off = np.arange(h * w, dtype=np.uint32)
    rec = np.zeros(h * w, dtype=np.dtype([("r", "u1"), ("g", "u1"),
                                          ("b", "u1"), ("off", "<u4")]))
    flat = arr.reshape(h * w, arr.shape[-1])
    rec["r"], rec["g"], rec["b"] = flat[:, 0], flat[:, 1], flat[:, 2]
    rec["off"] = off
    with open(path, "wb") as f:
        f.write(rec.tobytes())


def psnr(a, b, max_val: float = 1.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val ** 2 / mse))


def ssim(a, b, max_val: float = 1.0, win: int = 7) -> float:
    """Mean SSIM with a uniform `win`x`win` window (grayscale of RGB
    inputs). NOTE: trainer._ssim uses an 11x11 window — the two are
    different metrics; pass win=11 to match. Inputs smaller than the
    window have no valid region (np.convolve would silently swap
    operands), so they are rejected."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        a = a.mean(-1)
    if b.ndim == 3:
        b = b.mean(-1)
    if min(a.shape) < win or a.shape != b.shape:
        raise ValueError(
            f"ssim needs matching images at least {win}px per side, "
            f"got {a.shape} vs {b.shape}")

    def filt(x):
        # separable uniform filter, 'valid' windows
        k = np.ones(win) / win
        x = np.apply_along_axis(lambda r: np.convolve(r, k, "valid"), 1, x)
        x = np.apply_along_axis(lambda c: np.convolve(c, k, "valid"), 0, x)
        return x

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a ** 2
    var_b = filt(b * b) - mu_b ** 2
    cov = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(s.mean())
