"""PPO on Skeleton+ (stereo-audio maze hunt): simulator or the REAL ROM.

The online-phase trainer for the reference's second multimodal benchmark
(environments/skeleton_plus/SkelPlus.bin, gameplay per SkelPlus.txt §2):
streaming stereo footstep audio -> on-device MFCC planes feed the same
two-tower multimodal agent (audio tower sees both L/R channels).

    python scripts/skeleton_plus_ppo.py --num-envs 8                 # device sim
    python scripts/skeleton_plus_ppo.py --backend native             # SkelPlus.bin

``--backend native`` runs the actual cartridge on the in-repo C++ 2600 core
behind the io_callback bridge (RAM reward adapter in native/atari/skel_env.cc);
the observation/action contract is identical, so policies transfer.
"""

import dataclasses

from _common import BasePPOArgs, field, ppo_config_from

from mmtrl_tpu.algos.ppo import make_recurrent_ppo
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import MultimodalRecurrentAgent


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("skeleton_plus_ppo", "the name of this experiment")
    env_id: str = field("skeleton_plus", "the id of the environment")
    num_envs: int = field(8, "parallel envs")
    clip_rewards: bool = field(False, "shaped rewards stay raw")
    attn_type: str = field("casl", "crossmodal attention type")
    backend: str = field("sim", "env backend: 'sim' (device) or 'native' (real ROM)")
    rom_path: str = field(
        "/root/reference/environments/skeleton_plus/SkelPlus.bin",
        "cartridge path for --backend native",
    )
    frameskip: int = field(8, "emulator frames per env step (native backend)")
    reward_mode: str = field("shaped", "'shaped' (sim-compatible) or 'kills' (score delta)")
    repeat_action_probability: float = field(0.0, "ALE-v5 sticky actions, native backend (reference envpool setting: 0.25)")
    host_loop: bool = field(
        False,
        "native backend via the host rollout loop (policy+update on the "
        "accelerator, emulation on host) — for remote-TPU setups where "
        "io_callback cannot cross the tunnel",
    )
    eval_steps: int = field(
        4000, "greedy eval env-steps after host-loop training (0: skip)"
    )


def main(args=None):
    args = args or cli(Args)
    if args.backend == "native":
        # env_id may name any native-backed cartridge env (rally_native via
        # scripts/rally_ppo.py); the bare sim id maps to the SkelPlus ROM.
        native_key = (
            args.env_id
            if args.env_id.endswith("_native")
            else "skeleton_plus_native"
        )
        env = make(
            native_key,
            num_envs=args.num_envs,
            rom_path=args.rom_path,
            seed=args.seed,
            frameskip=args.frameskip,
            reward_mode=args.reward_mode,
            repeat_action_probability=args.repeat_action_probability,
        )
    else:
        env = make(args.env_id)
    cfg = ppo_config_from(args)
    model = MultimodalRecurrentAgent(
        num_actions=env.num_actions,
        conv_type=args.conv_size,
        attn_type=args.attn_type,
        fusion_type=args.fusion_type,
        input_scale=1.0,  # this env has no legacy /255 quirk to preserve
    )
    if args.host_loop:
        if args.backend != "native":
            raise SystemExit("--host-loop requires --backend native")
        from mmtrl_tpu.algos.ppo.hostloop import run_recurrent_ppo_hostloop

        return run_recurrent_ppo_hostloop(
            env, model, cfg, args, eval_steps=args.eval_steps
        )
    init_runner, train_iteration = make_recurrent_ppo(env, model, cfg)

    import jax.numpy as jnp

    def video_policy(params, obs, done, carry, key):
        logits, _, carry = model.apply(params, obs[None], done[None], carry)
        return jnp.argmax(logits[0], axis=-1), carry

    video_setup = (
        env, video_policy, lambda ts: ts.params, model.initial_carry(getattr(env, 'num_envs', 1))
    ) if args.capture_video else None
    return run_training(init_runner, train_iteration, cfg, args, video_setup=video_setup)


if __name__ == "__main__":
    main()
