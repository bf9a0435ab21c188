from neosr_tpu.ops.diffjpeg import diff_jpeg, quality_to_factor
from neosr_tpu.ops.filter import filter2d
from neosr_tpu.ops.resize import resize, resize_antialias

__all__ = ["diff_jpeg", "filter2d", "quality_to_factor", "resize", "resize_antialias"]
