from .bloom import (  # noqa: F401
    build_partitioned_bloom,
    write_sketch_store,
    load_sketch_store,
    probe_bloom,
    build_and_store,
)
from .agg import grouped_agg  # noqa: F401
from .asof import asof_join  # noqa: F401
from .interval import interval_join  # noqa: F401
from .graph import connected_components, k_core, keep_set_distributed  # noqa: F401
from .join import detect_hot_keys, hash_join  # noqa: F401
from .analytics import (  # noqa: F401
    explode_list,
    hopping_window_agg,
    latest_by_key,
    partitioned_window,
    pivot,
    unpivot,
)
from .delta_agg import merge_aggregate, read_aggregate  # noqa: F401
from .table_store import (  # noqa: F401
    bucketed_join,
    read_clustered,
    write_bucketed,
    write_clustered,
)
from .analytics import group_concat, resample_fill, topn_by_key  # noqa: F401
from .setops import except_distinct, intersect_distinct, set_op  # noqa: F401
