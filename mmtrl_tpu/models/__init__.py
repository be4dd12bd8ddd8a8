from mmtrl_tpu.models.common import AtariTower, MLPTower, ortho
from mmtrl_tpu.models.lstm import LSTMCell
from mmtrl_tpu.models.attention import CaslAttention, NewAttention, SigmoidGate
from mmtrl_tpu.models.agents import (
    MultimodalRecurrentAgent,
    RecurrentAgent,
    CNNAgent,
    MLPActorCritic,
    ContinuousActorCritic,
    QNetwork,
    DistributionalQNetwork,
    QFunction,
    DeterministicActor,
    SquashedGaussianActor,
)
from mmtrl_tpu.models import distributions

__all__ = [
    "AtariTower",
    "MLPTower",
    "ortho",
    "LSTMCell",
    "CaslAttention",
    "NewAttention",
    "SigmoidGate",
    "MultimodalRecurrentAgent",
    "RecurrentAgent",
    "CNNAgent",
    "MLPActorCritic",
    "ContinuousActorCritic",
    "QNetwork",
    "DistributionalQNetwork",
    "QFunction",
    "DeterministicActor",
    "SquashedGaussianActor",
    "distributions",
]
