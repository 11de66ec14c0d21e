from .registry import register_model, get_model, list_models, TwoViewPipeline
from .matchers import mutual_nearest_neighbor, LightGlueMatcher, rotary_encode
