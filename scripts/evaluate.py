"""Evaluate a saved run — greedy episodes from an Orbax checkpoint.

    python scripts/evaluate.py --load-from saved_agents/<run_name> \
        --script train --env-id minecraft --attn-type casl

The --script flag names the entry script whose model/arch flags apply; the
checkpoint's train-state params are restored into a freshly built model.
"""

import dataclasses
import importlib
from typing import Optional

import jax

from _common import field

from mmtrl_tpu.core.checkpoint import load_run
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.utils.evaluate import evaluate_policy


@dataclasses.dataclass
class Args:
    load_from: str = field("", "checkpoint path (saved_agents/<run_name>)")
    platform: str = field("", "force the jax platform ('cpu' for io_callback"
                              " envs on remote-TPU setups); empty = default")
    script: str = field("train", "entry script whose architecture to rebuild")
    env_id: str = field("minecraft", "environment id")
    seed: int = field(1, "evaluation seed")
    num_envs: int = field(16, "evaluation envs")
    num_steps: int = field(512, "evaluation env steps")
    greedy: bool = field(True, "argmax actions (False: sample)")
    attn_type: Optional[str] = field(None, "attention type (recurrent agents)")
    fusion_type: str = field("sum", "fusion type")
    conv_size: str = field("big", "conv tower size")
    input_scale: float = field(255.0, "observation divisor")


def build_model(args, env):
    if args.script in ("train", "minecraft_lstm", "skeleton_plus_ppo"):
        from mmtrl_tpu.models import MultimodalRecurrentAgent

        model = MultimodalRecurrentAgent(
            num_actions=env.num_actions,
            conv_type=args.conv_size,
            attn_type=args.attn_type,
            fusion_type=args.fusion_type,
            input_scale=args.input_scale,
        )
        return model, True
    if args.script == "minecraft_lstm_attention":
        from mmtrl_tpu.models import MultimodalRecurrentAgent

        return (
            MultimodalRecurrentAgent(
                num_actions=env.num_actions, conv_type=args.conv_size,
                attn_type="gate", fusion_type="sum",
                input_scale=args.input_scale,
            ),
            True,
        )
    if args.script == "minecraft_cnn":
        from mmtrl_tpu.models import CNNAgent

        return CNNAgent(
            num_actions=env.num_actions, conv_type=args.conv_size,
            input_scale=args.input_scale,
        ), False
    if args.script == "ppo":
        from mmtrl_tpu.models import MLPActorCritic

        return MLPActorCritic(num_actions=env.num_actions), False
    raise SystemExit(f"unknown --script {args.script!r}")


def main(args=None):
    args = args or cli(Args)
    if args.env_id.lower() == "skeleton_plus_native":
        # Native ROM env: fixed host pool size must match num_envs.  This is
        # the sim->ROM transfer evaluation path (same obs/action contract,
        # docs/environments.md fidelity table).
        env = make(args.env_id, num_envs=args.num_envs)
    else:
        env = make(args.env_id)
    model, recurrent = build_model(args, env)
    restored = load_run(args.load_from)
    params = restored["train_state"]["params"]
    carry = model.initial_carry(args.num_envs) if recurrent else None
    results = jax.jit(
        lambda k: evaluate_policy(
            env, model.apply, params, k,
            num_envs=args.num_envs, num_steps=args.num_steps,
            greedy=args.greedy, recurrent=recurrent, initial_carry=carry,
        )
    )(jax.random.PRNGKey(args.seed))
    results = {k: float(v) for k, v in jax.device_get(results).items()}
    print(results)
    return results


if __name__ == "__main__":
    main()
