from .kgram import make_kgram_hash_fn, list_column_to_numpy  # noqa: F401
from .sketch_agg import SketchAgg, sketch_rows_to_dict  # noqa: F401
