from .bloom import (  # noqa: F401
    build_partitioned_bloom,
    write_sketch_store,
    load_sketch_store,
    probe_bloom,
    build_and_store,
)
