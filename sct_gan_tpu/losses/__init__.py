from .focal import (
    binary_cross_entropy_with_logits,
    focal_loss,
    contract_level_focal_loss,
    spatial_aware_focal_loss,
)
from .syntax import SyntaxLossTables, solidity_syntax_loss, cross_entropy_loss

__all__ = [
    "binary_cross_entropy_with_logits",
    "focal_loss",
    "contract_level_focal_loss",
    "spatial_aware_focal_loss",
    "SyntaxLossTables",
    "solidity_syntax_loss",
    "cross_entropy_loss",
]
from .classes import (FocalLoss, ContractLevelFocalLoss,
                      SpatialAwareFocalLoss, SoliditySyntaxLoss)

__all__ += ["FocalLoss", "ContractLevelFocalLoss", "SpatialAwareFocalLoss",
            "SoliditySyntaxLoss"]
