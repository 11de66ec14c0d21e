"""Host-side image loading and preprocessing for the matching stack.

Role model: gluefactory/utils/image.py (ImagePreprocessor:12-102,
read_image:104-115, load_image:128). Same conf surface and output dict
(image, scales, image_size, transform, original_image_size, optional
square_pad + padding_mask); resizing is done with PIL (LANCZOS when
antialias is requested, matching the repo-wide PIL-parity convention of
data/datasets.py) or with nearest/bilinear filters, instead of kornia.

Arrays are channel-first float32 in [0, 1] ([C, H, W], grayscale [1, H, W])
— numpy on the host; feed `data["image"]` to jnp/device code downstream.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from PIL import Image


_FILTERS = {
    "nearest": Image.NEAREST,
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "lanczos": Image.LANCZOS,
    "area": Image.BOX,
}


@dataclasses.dataclass
class PreprocessConf:
    """Mirrors ImagePreprocessor.default_conf (image.py:13-22)."""

    resize: Optional[object] = None  # int edge length or (h, w) pair
    edge_divisible_by: Optional[int] = None
    side: str = "long"
    interpolation: str = "bilinear"
    antialias: bool = True
    square_pad: bool = False
    add_padding_mask: bool = False


class ImagePreprocessor:
    def __init__(self, conf=None, **kwargs):
        if isinstance(conf, PreprocessConf):
            self.conf = dataclasses.replace(conf, **kwargs)
        else:
            merged = dict(conf or {})
            merged.update(kwargs)
            self.conf = PreprocessConf(**merged)

    def get_new_image_size(self, h: int, w: int) -> Tuple[int, int]:
        """image.py:77-102 — side conventions + edge divisibility."""
        conf = self.conf
        if not isinstance(conf.resize, int):
            pair = tuple(int(x) for x in conf.resize)
            if len(pair) != 2:
                raise ValueError(f"resize pair must be (h, w), got {conf.resize}")
            size = pair
        else:
            side, side_size = conf.side, conf.resize
            aspect_ratio = w / h
            if side not in ("short", "long", "vert", "horz"):
                raise ValueError(
                    "side can be one of 'short', 'long', 'vert', 'horz'; "
                    f"got {side!r}"
                )
            if side == "vert":
                size = side_size, int(side_size * aspect_ratio)
            elif side == "horz":
                size = int(side_size / aspect_ratio), side_size
            elif (side == "short") ^ (aspect_ratio < 1.0):
                size = side_size, int(side_size * aspect_ratio)
            else:
                size = int(side_size / aspect_ratio), side_size
        if conf.edge_divisible_by is not None:
            df = conf.edge_divisible_by
            size = tuple(int(x // df * df) for x in size)
        return size

    def _resize(self, img: np.ndarray, size: Tuple[int, int],
                interpolation: str) -> np.ndarray:
        """[C, H, W] float -> [C, h, w] float via PIL per channel."""
        if self.conf.antialias and interpolation in ("bilinear", "bicubic"):
            # kornia's antialias pre-blur for downscale; LANCZOS is the
            # windowed-sinc equivalent PIL offers (and the convention the
            # dataset pipeline already standardizes on)
            filt = Image.LANCZOS
        else:
            filt = _FILTERS[interpolation]
        h, w = size
        chans = [
            np.asarray(
                Image.fromarray(c.astype(np.float32), mode="F").resize(
                    (w, h), filt
                ),
                dtype=np.float32,
            )
            for c in img
        ]
        return np.stack(chans, axis=0)

    def __call__(self, img: np.ndarray,
                 interpolation: Optional[str] = None) -> dict:
        img = np.asarray(img, dtype=np.float32)
        if img.ndim == 2:
            img = img[None]
        h, w = img.shape[-2:]
        size = (h, w)
        if self.conf.resize is not None:
            size = self.get_new_image_size(h, w)
            img = self._resize(
                img, size, interpolation or self.conf.interpolation
            )
        scale = np.array(
            [img.shape[-1] / w, img.shape[-2] / h], dtype=np.float32
        )
        transform = np.diag([scale[0], scale[1], 1.0]).astype(np.float32)

        data = {
            "scales": scale,
            "image_size": np.array(size[::-1]),
            "transform": transform,
            "original_image_size": np.array([w, h]),
        }
        if self.conf.square_pad:
            sl = max(img.shape[-2:])
            canvas = np.zeros((img.shape[0], sl, sl), dtype=img.dtype)
            canvas[:, : img.shape[-2], : img.shape[-1]] = img
            data["image"] = canvas
            if self.conf.add_padding_mask:
                mask = np.zeros((1, sl, sl), dtype=bool)
                mask[:, : img.shape[-2], : img.shape[-1]] = True
                data["padding_mask"] = mask
        else:
            data["image"] = img
        return data

    def load_image(self, image_path) -> dict:
        return self(load_image(image_path))


def read_image(path, grayscale: bool = False) -> np.ndarray:
    """[H, W, C] uint8 RGB (or [H, W] grayscale) from disk (image.py:104)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"No image at path {path}.")
    with Image.open(path) as im:
        im = im.convert("L" if grayscale else "RGB")
        return np.asarray(im)


def numpy_image_to_chw(image: np.ndarray) -> np.ndarray:
    """HWC/HW uint8-or-float -> CHW float32 in [0, 1] (image.py:117)."""
    if image.ndim == 3:
        image = image.transpose(2, 0, 1)
    elif image.ndim == 2:
        image = image[None]
    else:
        raise ValueError(f"Not an image: {image.shape}")
    return (image / 255.0).astype(np.float32)


def load_image(path, grayscale: bool = False) -> np.ndarray:
    return numpy_image_to_chw(read_image(path, grayscale=grayscale))
