"""Image IO and comparison.

Ref: impact_io/src/image.rs (PNG encode/decode) and the snapshot tester's
hybrid RGB comparison (apps/snapshot_tester/src/testing.rs:157-201 using
image_compare::rgb_hybrid_compare). The comparison here blends a per-channel
structural-similarity score with an RGB distance score, serving the same
golden-image gating role.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ImageMetadata(NamedTuple):
    """Dimensions + pixel format of an image on disk without decoding it
    (ref: impact_io/src/image.rs:22 ImageMetadata / PixelFormat)."""

    width: int
    height: int
    pixel_format: str  # "rgba8" | "rgb8" | "luma8"


_FORMAT_OF_MODE = {"RGBA": "rgba8", "RGB": "rgb8", "L": "luma8"}


def read_image_metadata(path) -> ImageMetadata:
    """Ref: impact_io/src/image.rs:91 read_metadata_for_image_at_path —
    PIL lazily parses only the header here. Unsupported on-disk pixel
    formats (palette, 16-bit, luma+alpha, ...) raise like the reference's
    PixelFormat::try_from does, instead of being misreported."""
    from PIL import Image

    with Image.open(path) as im:
        fmt = _FORMAT_OF_MODE.get(im.mode)
        if fmt is None:
            raise ValueError(
                f"unsupported pixel format (PIL mode {im.mode!r}) in {path}"
            )
        return ImageMetadata(im.width, im.height, fmt)


def load_image(path_or_bytes, mode: str | None = None) -> np.ndarray:
    """Decode PNG/JPEG (any PIL-supported container) from a path or raw
    bytes to a u8 array (ref: impact_io/src/image.rs:113/154
    load_image_from_path / load_image_from_bytes). ``mode`` forces "RGB",
    "RGBA" or "L"; default keeps the natural channel count."""
    import io

    from PIL import Image

    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    im = Image.open(src)
    if mode is not None:
        im = im.convert(mode)
    elif im.mode not in _FORMAT_OF_MODE:
        im = im.convert("RGB")
    return np.asarray(im)


def save_png(path, image_u8):
    from PIL import Image

    Image.fromarray(np.asarray(image_u8)).save(path)


def save_jpeg(path, image_u8, quality: int = 92):
    """JPEG encode (ref: impact_io image format support — the reference
    decodes/encodes both PNG and JPEG containers)."""
    from PIL import Image

    arr = np.asarray(image_u8)
    if arr.ndim == 3 and arr.shape[-1] == 4:
        arr = arr[..., :3]  # JPEG has no alpha
    Image.fromarray(arr).save(path, format="JPEG", quality=quality)


def load_png(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def _ssim_gray(a, b):
    """Global SSIM on float images in [0,1] (single window — adequate for the
    small golden images; windowed SSIM can slot in later)."""
    c1, c2 = 0.01**2, 0.03**2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )


def rgb_hybrid_compare(a_u8, b_u8) -> float:
    """Similarity score in [0,1]; 1 = identical. Hybrid of per-channel SSIM
    and mean RGB proximity (role of image_compare::rgb_hybrid_compare)."""
    a = np.asarray(a_u8, np.float32) / 255.0
    b = np.asarray(b_u8, np.float32) / 255.0
    if a.shape != b.shape:
        return 0.0
    ssim = float(np.mean([_ssim_gray(a[..., c], b[..., c]) for c in range(3)]))
    rms = float(np.sqrt(np.mean((a - b) ** 2)))
    return max(0.0, min(1.0, 0.5 * (ssim + (1.0 - rms))))
