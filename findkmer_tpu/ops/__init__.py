from findkmer_tpu.ops.window import window_codes, window_codes_wide
from findkmer_tpu.ops.histogram import dense_counts
from findkmer_tpu.ops.sparse import batch_to_runs, merge_runs, SENTINEL

__all__ = [
    "window_codes",
    "window_codes_wide",
    "dense_counts",
    "batch_to_runs",
    "merge_runs",
    "SENTINEL",
]
