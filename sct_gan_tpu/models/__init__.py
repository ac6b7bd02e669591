from .layers import (
    MultiheadAttention,
    TransformerEncoderStack,
    TransformerDecoderStack,
    sinusoidal_position_encoding,
    line_position_encoding,
)
from .sct_transformer import SmartContractTransformer

__all__ = [
    "MultiheadAttention",
    "TransformerEncoderStack",
    "TransformerDecoderStack",
    "sinusoidal_position_encoding",
    "line_position_encoding",
    "SmartContractTransformer",
]
