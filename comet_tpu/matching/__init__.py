from .registry import register_model, get_model, list_models, TwoViewPipeline
from .matchers import mutual_nearest_neighbor, rotary_encode
from .lightglue import (
    LearnableFourierPosEnc,
    LightGlueMatcher,
    confidence_threshold,
    filter_matches,
    lightglue_loss,
    normalize_keypoints,
    sigmoid_log_double_softmax,
)
from .sift import extract_sift, dog_keypoints, sift_descriptors, gaussian_blur
from .extractors import make_superpoint
from .gt_generation import (
    IGNORE,
    UNMATCHED,
    gt_matches_from_homography,
    gt_matches_from_pose,
    warp_homography,
)
from .depth_gt import (
    dense_warp_consistency,
    essential_to_fundamental,
    gt_line_matches_from_homography,
    gt_line_matches_from_pose_depth,
    gt_matches_from_pose_depth,
    pose_to_essential,
    project_points_with_depth,
    sample_depth,
    sym_epipolar_distance_all,
)
from .eval import eval_matches_homography, matcher_metrics
from .train import (
    build_matcher_train_step,
    build_superglue_train_step,
    make_homography_training_batch,
    matcher_nll_loss,
)
from .superglue import SuperGlueMatcher, log_sinkhorn, superglue_nll_loss
from .eval_pipeline import (
    AUCMetric,
    EvalPipeline,
    HomographyEvalPipeline,
    cal_error_auc,
    eval_poses,
    export_predictions,
    load_predictions,
    save_eval,
    load_eval,
    exists_eval,
)
from .extractors import make_aliked
from .gluestick import GlueStickMatcher, gluestick_nll_loss
from .lines import (
    LineSegments,
    detect_line_segments,
    match_lines_nn,
    sample_line_descriptors,
    sample_line_points,
    make_wireframe,
)
from .deeplsd import (
    DeepLSDNet,
    DeepLSDDetector,
    deeplsd_field_loss,
    extract_lines_from_fields,
)
from .cache_loader import (
    CacheLoader,
    TripletPipeline,
    pad_local_features,
    pad_to_length,
)
from .viz import (
    cm_RdGn,
    draw_epipolar_lines,
    draw_keypoints,
    draw_line_matches,
    draw_lines,
    draw_matches,
    heatmap_overlay,
    plot_cumulative_errors,
    side_by_side,
)
from .configs import EXPERIMENTS, build_pipeline, get_experiment, list_experiments
from .augmentations import (
    LG_PRESET,
    PhotometricConfig,
    photometric_augment,
    sample_homography_difficulty,
)
from .tools import (
    AverageMetric,
    FAverageMetric,
    MedianMetric,
    PRMetric,
    QuantileMetric,
    RecallMetric,
    Timer,
    fork_rng,
    set_seed,
)
from .image import ImagePreprocessor, load_image, numpy_image_to_chw, read_image
from .misc import (
    batch_to_device,
    batch_to_numpy,
    get_twoview,
    get_view,
    index_batch,
    map_tensor,
    rbd,
    stack_twoviews,
    to_view,
    unstack_twoviews,
)
from .inspect_frames import PLOT_REGISTRY, GlobalFrame, TwoViewFrame
from .backbones import make_dinov2_backbone
from .patches import (
    batch_extract_patches,
    build_heatmap,
    draw_image_patches,
    extract_patches,
)
from .capture import apply_backspaces_and_linefeeds, capture_outputs
