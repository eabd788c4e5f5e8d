"""TIFF volume IO via Pillow (tifffile is not installed here).

Reads/writes multi-page grayscale TIFFs as (pages, H, W) arrays --
eager ndarrays like the reference's tifffile path
(reference img_util.py:100-121).
"""

import io

import numpy as np


def read_tiff(path_or_bytes):
    """Read a (multi-page) TIFF into an ndarray (Z, H, W) or (H, W)."""
    from PIL import Image

    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    with Image.open(src) as img:
        pages = []
        for i in range(getattr(img, "n_frames", 1)):
            img.seek(i)
            pages.append(np.asarray(img))
    if len(pages) == 1:
        return pages[0]
    return np.stack(pages)


def write_tiff(path, array):
    """Write an (Z, H, W) or (H, W) grayscale array as TIFF."""
    from PIL import Image

    array = np.asarray(array)
    if array.ndim == 2:
        array = array[None]
    if array.ndim != 3:
        raise ValueError(f"expected 2D/3D array, got {array.shape}")
    frames = [Image.fromarray(p) for p in array]
    frames[0].save(path, save_all=True, append_images=frames[1:])
    return path
