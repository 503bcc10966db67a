from .bloom import (  # noqa: F401
    build_partitioned_bloom,
    write_sketch_store,
    load_sketch_store,
    probe_bloom,
    build_and_store,
)
from .agg import grouped_agg  # noqa: F401
from .graph import connected_components, keep_set_distributed  # noqa: F401
from .join import hash_join  # noqa: F401
