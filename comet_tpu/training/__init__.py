from .optim import build_optimizer, warmup_cosine_restarts, camera_only_mask
from .stats import RunningStats, CsvLogger, TrainingMonitor, TO_PLOT_METRICS
from .loop import (
    build_eval_step,
    build_train_step,
    evaluate,
    metric_block,
    make_gt_cameras,
)
from .checkpoints import (
    save_checkpoint,
    restore_checkpoint,
    find_last_checkpoint,
    auto_resume,
)
