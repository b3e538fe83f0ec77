from whvi_tpu.models.layers import (
    Activation,
    Dense,
    Parallel,
    WHVILinear,
    cosine,
    relu,
    sigmoid,
    tanh,
)
from whvi_tpu.models.likelihoods import (
    CategoricalLikelihood,
    GaussianLikelihood,
    HeteroscedasticGaussianLikelihood,
)
from whvi_tpu.models.networks import (
    WHVIClassification,
    WHVINetwork,
    WHVIRegression,
    mlp_layers,
)
from whvi_tpu.models.weights import (
    ColumnMatrix,
    PaddedSquareMatrix,
    SquarePow2Matrix,
    StackedMatrix,
    setup_dimensions,
)

__all__ = [
    "Activation",
    "CategoricalLikelihood",
    "ColumnMatrix",
    "Dense",
    "GaussianLikelihood",
    "PaddedSquareMatrix",
    "Parallel",
    "HeteroscedasticGaussianLikelihood",
    "SquarePow2Matrix",
    "StackedMatrix",
    "WHVILinear",
    "WHVIClassification",
    "WHVINetwork",
    "WHVIRegression",
    "cosine",
    "mlp_layers",
    "relu",
    "setup_dimensions",
    "sigmoid",
    "tanh",
]
