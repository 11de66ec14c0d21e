from .serialization import save_params_msgpack, load_params_msgpack
from .export import export_sequence_json
