from findkmer_tpu.ops.window import window_codes, window_codes_wide
from findkmer_tpu.ops.histogram import dense_counts
from findkmer_tpu.ops.sparse import SENTINEL, compact_raw, compact_counted

__all__ = [
    "window_codes",
    "window_codes_wide",
    "dense_counts",
    "SENTINEL",
    "compact_raw",
    "compact_counted",
]
