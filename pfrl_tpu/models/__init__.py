"""NN model substrate on flax.linen (reference parity: pfrl/nn/).

flax.linen plays the role torch.nn plays in the reference: pfrl_tpu's model
zoo consists of linen Modules whose ``__call__`` returns arrays,
``ActionValue`` structs, or ``Distribution`` structs. Parameters are pure
pytrees, so agents jit over them directly.
"""

from pfrl_tpu.models.atari_cnn import LargeAtariCNN, SmallAtariCNN
from pfrl_tpu.models.branched import Branched
from pfrl_tpu.models.empirical_normalization import (
    EmpiricalNormalization,
    NormalizerState,
)
from pfrl_tpu.models.lmbda import Lambda
from pfrl_tpu.models.mlp import MLP, MLPBN
from pfrl_tpu.models.noisy_linear import FactorizedNoisyDense, to_factorized_noisy
from pfrl_tpu.models.misc import BoundByTanh, ConcatObsAndAction
from pfrl_tpu.models.recurrent import (
    GRUCellModule,
    LSTMCellModule,
    RecurrentBranched,
    RecurrentSequential,
)

__all__ = [
    "LargeAtariCNN",
    "SmallAtariCNN",
    "Branched",
    "EmpiricalNormalization",
    "NormalizerState",
    "Lambda",
    "MLP",
    "MLPBN",
    "FactorizedNoisyDense",
    "to_factorized_noisy",
    "BoundByTanh",
    "ConcatObsAndAction",
    "RecurrentBranched",
    "RecurrentSequential",
    "LSTMCellModule",
    "GRUCellModule",
]
