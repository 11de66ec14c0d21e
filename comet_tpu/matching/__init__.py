from .registry import register_model, get_model, list_models, TwoViewPipeline
from .matchers import mutual_nearest_neighbor, LightGlueMatcher, rotary_encode
from .sift import extract_sift, dog_keypoints, sift_descriptors, gaussian_blur
from .extractors import make_superpoint
from .gt_generation import (
    IGNORE,
    UNMATCHED,
    gt_matches_from_homography,
    gt_matches_from_pose,
    warp_homography,
)
from .eval import eval_matches_homography
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
from .lines import (
    GlueStickMatcher,
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
from .configs import EXPERIMENTS, build_pipeline, get_experiment, list_experiments
from .augmentations import (
    LG_PRESET,
    PhotometricConfig,
    photometric_augment,
    sample_homography_difficulty,
)
