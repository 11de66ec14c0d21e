"""`match --export-features` CLI path -> h5 cache -> CacheLoader roundtrip
(gluefactory/scripts/export_local_features.py equivalent)."""

import json
import os

import numpy as np
import pytest

from comet_tpu.cli import main
from comet_tpu.matching.cache_loader import CacheLoader


@pytest.mark.slow
def test_export_features_roundtrip(tmp_path, capsys):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = rng.integers(0, 255, (96, 96), np.uint8)
        # blobs the detector can find
        arr[20:28, 30:38] = 255
        arr[60:70, 50:60] = 0
        Image.fromarray(arr).save(img_dir / f"im{i}.png")

    exp_dir = tmp_path / "exp"
    main([
        "match", "--experiment", "superpoint+nn",
        "--export-features", str(img_dir),
        "--exp-dir", str(exp_dir), "--image-size", "96",
    ])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["exported"] == 2
    path = row["path"]
    assert os.path.exists(path)

    loader = CacheLoader(path, padding_length=512)
    pred = loader({"name": "im0"})
    assert pred["keypoints"].shape == (512, 2)
    assert pred["descriptors"].shape[0] == 512
    # scale applied on request (e.g. eval at a different resolution)
    pred2 = loader({"name": "im1", "scales": 2.0})
    assert pred2["keypoints"].max() <= 2 * 96
