from .recon import (
    cross_entropy_ignore,
    mse_loss,
    sparsity_loss,
    weight_reg_loss,
)
from .style import (
    AdaINStyleLoss,
    GramStyleLoss,
    MattingLaplacian,
    NNFMStyleLoss,
    SemanticStyleLoss,
    get_style_loss,
)

__all__ = [
    "AdaINStyleLoss",
    "GramStyleLoss",
    "MattingLaplacian",
    "NNFMStyleLoss",
    "SemanticStyleLoss",
    "cross_entropy_ignore",
    "get_style_loss",
    "mse_loss",
    "sparsity_loss",
    "weight_reg_loss",
]
