"""Native (C++) frame-loading path for the video-pose datasets.

Wraps a :class:`~comet_tpu.data.datasets.VideoPoseDataset` so the hot
host-side image work — frame decode, mask decode + bbox scan, crop,
LANCZOS resize, ImageNet normalization — runs in the cometio shared
library (comet_tpu/native/cometio.cpp) on a std::thread pool instead of
serially through PIL in Python. The resample stage is BIT-EXACT against
PIL's 8-bit fixed-point Lanczos and the mask luma/bbox logic matches
``convert("L")`` + ``mask_bbox`` (tests/test_native_loader.py asserts
full-sample equality with the host path on the fixture), so this is a
pure throughput choice — metrics are unchanged.

Only the pose text files and the final first-mask NEAREST resize stay in
numpy/PIL (negligible cost, exact parity kept trivially). Reference
counterpart: the PIL decode/resize loop of
kubric_movif_SFM_dataset_YT.py:160-266.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
from PIL import Image

from .datasets import (
    SequenceSample,
    VideoPoseDataset,
    compute_sequence_square,
    parse_pose_file,
)
from .. import native


class NativeLoaderDataset:
    """Drop-in dataset wrapper using the C++ loader for frames + masks."""

    def __init__(self, base: VideoPoseDataset, n_threads: int = 0):
        if not native.available():
            raise RuntimeError(
                f"native loader unavailable: {native.build_error()}"
            )
        self.base = base
        self.crop_size = base.crop_size
        self.seq_names = base.seq_names
        self.n_threads = n_threads

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, index: int) -> SequenceSample:
        return self.load_sequence(self.seq_names[index])

    def load_sequence(self, seq_name: str) -> SequenceSample:
        base = self.base
        # shared listing/sampling head (same RNG consumption as the PIL
        # path, so PIL/native runs are interchangeable)
        frame_paths, mask_paths, gt_paths, names = base._select_files(seq_name)

        # threaded native mask decode: per-frame bboxes + mask 0 pixels
        bboxes, mask0 = native.load_masks(mask_paths, self.n_threads)
        square, ratio = compute_sequence_square(bboxes, self.crop_size)

        # poses (host, tiny; shared parser with the PIL path)
        t_list: List[np.ndarray] = []
        q_list, uvz_list, r_list = [], [], []
        for gp in gt_paths:
            r_mat, t_vec, quat, uvz = parse_pose_file(gp, base.intr)
            t_list.append(t_vec)
            q_list.append(quat)
            uvz_list.append(uvz)
            r_list.append(r_mat)

        # threaded native decode + crop + LANCZOS + normalize
        images = native.load_sequence(
            frame_paths, square, self.crop_size, n_threads=self.n_threads
        )

        mask_pil = Image.fromarray(mask0).crop(tuple(square))
        first_mask = (
            np.asarray(
                mask_pil.resize(
                    (self.crop_size, self.crop_size), Image.Resampling.NEAREST
                ),
                np.uint8,
            )
            > 0
        )

        return SequenceSample(
            images=images,
            t_xyz=np.asarray(t_list, np.float32),
            q_wxyz=np.asarray(q_list, np.float32),
            t_uvz=np.asarray(uvz_list, np.float32),
            r_matrix=np.asarray(r_list, np.float32),
            ratio=float(ratio),
            seq_name=seq_name,
            image_names=names,
            first_mask=first_mask,
        )
