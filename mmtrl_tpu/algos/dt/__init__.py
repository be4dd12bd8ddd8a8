from mmtrl_tpu.algos.dt.data import (
    collect_trajectories,
    returns_to_go,
    TrajectoryBuffer,
)
from mmtrl_tpu.algos.dt.train import DTTrainConfig, make_dt_train_step, create_dt_state
from mmtrl_tpu.algos.dt.evaluate import evaluate_dt

__all__ = [
    "collect_trajectories",
    "returns_to_go",
    "TrajectoryBuffer",
    "DTTrainConfig",
    "make_dt_train_step",
    "create_dt_state",
    "evaluate_dt",
]
