from .blocks import (
    Mlp,
    MultiHeadAttention,
    AttnBlock,
    CrossAttnBlock,
    InstanceNorm,
    ResidualBlock,
)
from .encoders import BasicEncoder, ShallowEncoder
from .update_former import EfficientUpdateFormer
from .tracker import BaseTracker, TrackerOutput, tracker_transformer_dim
from .refine import refine_track, compute_score_fn
from .vit import DinoViT, ViTBlock
from .camera_predictor import CameraPredictor, CameraPredictions
from .comet import COMET, encode_gt, decode_predictions, pose_loss
