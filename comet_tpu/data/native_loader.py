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
    matrix_to_quat_wxyz,
    sample_evenly,
    sample_with_max_gap,
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

    def _select_paths(self, seq_name: str):
        """File listing + temporal sampling (datasets._load_common head,
        same RNG consumption so PIL/native runs are interchangeable)."""
        base = self.base
        frames_dir, gts_dir, masks_dir = base._frame_dirs(seq_name)
        fpre, gpre, mpre = base._frame_prefixes()
        image_names = sorted(
            f for f in os.listdir(frames_dir) if f.startswith(fpre)
        )
        gt_names = sorted(f for f in os.listdir(gts_dir) if f.startswith(gpre))
        mask_names = sorted(
            f for f in os.listdir(masks_dir) if f.startswith(mpre)
        )
        total = len(image_names)
        if base.use_augs:
            sel = sample_with_max_gap(total, base.seq_len, base.rng)
        else:
            sel = sample_evenly(total, base.seq_len)
        frame_paths = [os.path.join(frames_dir, image_names[i]) for i in sel]
        mask_paths = [os.path.join(masks_dir, mask_names[i]) for i in sel]
        gt_paths = [os.path.join(gts_dir, gt_names[i]) for i in sel]
        names = [image_names[i] for i in sel]
        return frame_paths, mask_paths, gt_paths, names

    def load_sequence(self, seq_name: str) -> SequenceSample:
        base = self.base
        frame_paths, mask_paths, gt_paths, names = self._select_paths(seq_name)

        # threaded native mask decode: per-frame bboxes + mask 0 pixels
        bboxes, mask0 = native.load_masks(mask_paths, self.n_threads)
        square, ratio = compute_sequence_square(bboxes, self.crop_size)

        # poses (host, tiny)
        t_list: List[np.ndarray] = []
        q_list, uvz_list, r_list = [], [], []
        intr = base.intr
        for gp in gt_paths:
            pose = np.loadtxt(gp)
            if pose.shape != (4, 4):
                raise ValueError(f"{gp} is not a 4x4 pose matrix")
            r_mat = pose[:3, :3]
            t_vec = pose[:3, 3]
            if abs(t_vec[2]) < 1e-6:
                raise ZeroDivisionError(f"Tz ~ 0 in {gp}")
            u = (intr.fx * t_vec[0] + intr.cx * t_vec[2]) / t_vec[2]
            v = (intr.fy * t_vec[1] + intr.cy * t_vec[2]) / t_vec[2]
            t_list.append(t_vec)
            q_list.append(matrix_to_quat_wxyz(r_mat))
            uvz_list.append([u, v, t_vec[2]])
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
