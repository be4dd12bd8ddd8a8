"""Google-variant multimodal PPO-LSTM — the reference's
src/minecraft_lstm_google.py: full Nature conv trunks with 256-d
projections (:36-59, NOT conv_factory's 'small' towers), concat fusion
into LSTM(512->128), and distinct MLP heads with std=1 hidden inits
(actor: Tanh(32) :67-71, critic: Tanh(128) :73-77).

--policy-offset: the reference PARSES and STORES this flag
(minecraft_lstm_google.py:35) but never wires it into the forward pass —
dead code upstream.  Here the documented intent is implemented: when >0
the action distribution is mixed toward uniform,
p' = (1-o)*softmax(logits) + o/A.  Pass --policy-offset 0 for exact
reference behavior (shape-parity is tested either way,
tests/test_google_agent.py).

    python scripts/minecraft_lstm_google.py --policy-offset 0.5
"""

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from _common import BasePPOArgs, field, ppo_config_from

from mmtrl_tpu.algos.ppo import make_recurrent_ppo
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models.agents import _RecurrentCore, _nchw_to_nhwc
from mmtrl_tpu.models.common import AtariTower, ZEROS, ortho
from mmtrl_tpu.models.lstm import Carry, LSTMCell


class GoogleAgent(nn.Module):
    """Small towers, concat fusion, MLP heads; the policy-offset mixes the
    action distribution with uniform: p' = (1-o)*softmax(logits) + o/A."""

    num_actions: int
    policy_offset: float = 0.5
    lstm_features: int = 128
    input_scale: float = 255.0

    @nn.compact
    def __call__(self, obs, done, carry) -> Tuple[jnp.ndarray, jnp.ndarray, Carry]:
        T, B = obs.shape[:2]
        flat = obs.reshape((T * B,) + obs.shape[2:]) / self.input_scale
        # Reference towers are the BIG Nature conv trunk projected to 256
        # (minecraft_lstm_google.py:36-59), not conv_factory's 'small'.
        video = AtariTower("big", features=256, name="video_net")(
            _nchw_to_nhwc(flat[:, 0:1])
        ).reshape(T, B, -1)
        audio = AtariTower("big", features=256, name="audio_net")(
            _nchw_to_nhwc(flat[:, 1:])
        ).reshape(T, B, -1)
        core = nn.scan(
            _RecurrentCore,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(None, "concat", self.lstm_features, name="core")
        carry, hidden = core(carry, (video, audio, done))

        # Hidden layers use std=1 orthogonal init (reference :68,74), not
        # the sqrt(2) default.
        a = nn.tanh(nn.Dense(32, kernel_init=ortho(1.0), bias_init=ZEROS)(hidden))
        logits = nn.Dense(
            self.num_actions, kernel_init=ortho(0.01), bias_init=ZEROS, name="actor"
        )(a)
        if self.policy_offset > 0:
            probs = nn.softmax(logits, axis=-1)
            probs = (1.0 - self.policy_offset) * probs + (
                self.policy_offset / self.num_actions
            )
            logits = jnp.log(probs)
        c = nn.tanh(nn.Dense(128, kernel_init=ortho(1.0), bias_init=ZEROS)(hidden))
        value = nn.Dense(1, kernel_init=ortho(1.0), bias_init=ZEROS, name="critic")(
            c
        )[..., 0]
        return logits, value, carry

    def initial_carry(self, batch_size: int) -> Carry:
        return LSTMCell.initial_carry(batch_size, self.lstm_features)


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("minecraft_lstm_google", "the name of this experiment")
    env_id: str = field("minecraft", "the id of the environment")
    num_envs: int = field(1, "parallel envs")
    num_minibatches: int = field(1, "mini-batches")
    update_epochs: int = field(1, "update epochs")


def main(args=None):
    args = args or cli(Args)
    env = make(args.env_id)
    cfg = ppo_config_from(args)
    model = GoogleAgent(
        num_actions=env.num_actions, policy_offset=args.policy_offset
    )
    init_runner, train_iteration = make_recurrent_ppo(env, model, cfg)
    return run_training(init_runner, train_iteration, cfg, args)


if __name__ == "__main__":
    main()
