from .attention import dot_product_attention, mha_reference
from .segment_mean import line_segment_mean
from .sampling import top_k_top_p_filter, sample_categorical

__all__ = [
    "dot_product_attention",
    "mha_reference",
    "line_segment_mean",
    "top_k_top_p_filter",
    "sample_categorical",
]
