from .bilinear import (
    bilinear_sample,
    interp_matrix_align_corners,
    sample_features,
    resize_bilinear_align_corners,
)
from .corr import (
    avg_pool_2x2,
    build_fmap_pyramid,
    corr_pyramid_sample,
    corr_volume_pyramid_sample,
    extract_patches,
    extract_patches_ex,
)
