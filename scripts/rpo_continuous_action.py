"""Robust Policy Optimization — the reference's cleanrl/rpo_continuous_action.py:
PPO with a uniform perturbation of the Gaussian mean when evaluating stored
actions (rpo_alpha, reference :108-140).

    python scripts/rpo_continuous_action.py --rpo-alpha 0.5
"""

import dataclasses

import ppo_continuous_action
from _common import field

from mmtrl_tpu.core.config import cli


@dataclasses.dataclass
class Args(ppo_continuous_action.Args):
    exp_name: str = field("rpo_continuous_action", "the name of this experiment")
    rpo_alpha: float = field(0.5, "RPO mean-perturbation radius")


def main(args=None):
    return ppo_continuous_action.main(args or cli(Args))


if __name__ == "__main__":
    main()
