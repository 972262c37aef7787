from findkmer_tpu.ops.pallas.histogram_kernel import (
    fused_count_available,
    fused_window_histogram,
)

__all__ = ["fused_window_histogram", "fused_count_available"]
