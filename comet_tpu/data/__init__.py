from .datasets import (
    AMDDataset,
    DCADataset,
    SequenceSample,
    VideoPoseDataset,
    sample_with_max_gap,
    sample_evenly,
    make_bbox_square,
    mask_bbox,
)
from .keypoints import (
    seed_query_points,
    filter_and_pad,
    detect_corners,
    grid_points,
    denormalize_image,
)
from .fixtures import generate_amd_fixture
