from mmtrl_tpu.algos.dt.data import (
    collect_trajectories,
    returns_to_go,
    TrajectoryBuffer,
)
from mmtrl_tpu.algos.dt.train import (
    DTTrainConfig,
    create_dt_state,
    make_dt_train_step,
    make_dt_train_steps,
)
from mmtrl_tpu.algos.dt.evaluate import evaluate_dt

__all__ = [
    "collect_trajectories",
    "returns_to_go",
    "TrajectoryBuffer",
    "DTTrainConfig",
    "make_dt_train_step",
    "make_dt_train_steps",
    "create_dt_state",
    "evaluate_dt",
]
