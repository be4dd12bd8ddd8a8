"""CLI bridge tests: the generated flags must behave like CleanRL argparse
(strtobool booleans, kebab-case names, derived fields — src/utils.py:47-129)."""

import dataclasses
from typing import Optional

from mmtrl_tpu.core.config import cli


@dataclasses.dataclass
class DemoArgs:
    exp_name: str = "demo"
    seed: int = 1
    cuda: bool = True
    track: bool = False
    learning_rate: float = 2.5e-4
    num_envs: int = 4
    num_steps: int = 128
    target_kl: Optional[float] = None
    batch_size: int = dataclasses.field(default=0, metadata={"derived": True})

    def __post_init__(self):
        self.batch_size = self.num_envs * self.num_steps


def test_defaults():
    args = cli(DemoArgs, [])
    assert args.seed == 1 and args.cuda is True and args.track is False
    assert args.batch_size == 4 * 128
    assert args.target_kl is None


def test_strtobool_variants():
    assert cli(DemoArgs, ["--cuda", "False"]).cuda is False
    assert cli(DemoArgs, ["--cuda", "no"]).cuda is False
    assert cli(DemoArgs, ["--track"]).track is True
    assert cli(DemoArgs, ["--track", "true"]).track is True


def test_kebab_case_and_derived():
    args = cli(DemoArgs, ["--num-envs", "8", "--learning-rate", "1e-3"])
    assert args.num_envs == 8 and args.learning_rate == 1e-3
    assert args.batch_size == 8 * 128


def test_optional_float():
    assert cli(DemoArgs, ["--target-kl", "0.015"]).target_kl == 0.015
