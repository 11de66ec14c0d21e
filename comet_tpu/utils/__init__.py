from .serialization import (
    cast_params_for_inference,
    load_params_msgpack,
    save_params_msgpack,
)
from .export import export_sequence_json
