"""Greedy AND sampled evals of a saved recurrent policy on a native ROM env.

Deterministic (argmax) policies can collapse on Breakout-class dynamics —
the ball/paddle phase-locks into a loop the argmax policy never breaks (the
classic ALE determinism pathology; the reference's Atari scripts report
stochastic training returns for the same reason). This tool reports both
action rules from one checkpoint so the gap itself is a measurement.

    JAX_PLATFORMS=cpu python tools/eval_rom_policy.py \
        --load-from saved_agents/brick_native__brick_ppo_s1__1__<ts> \
        --env-id brick_native --num-envs 8 --num-steps 4000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--load-from", required=True)
    p.add_argument("--env-id", default="brick_native")
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=4000)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--conv-size", default="small")
    p.add_argument("--attn-type", default="casl")
    p.add_argument(
        "--repeat-action-probability", type=float, default=0.0,
        help="ALE-v5 sticky actions (the reference's envpool RND-Atari "
        "setting is 0.25, ppo_rnd_envpool.py:281); breaks the argmax "
        "phase-lock so a greedy eval measures policy quality, not "
        "emulator determinism",
    )
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # The env var alone is not honored when an axon TPU plugin is installed;
    # force the backend the same way core/config.py:98 does for --platform.
    jax.config.update("jax_platforms", "cpu")

    from mmtrl_tpu.core.checkpoint import load_run
    from mmtrl_tpu.envs import make
    from mmtrl_tpu.models import MultimodalRecurrentAgent
    from mmtrl_tpu.utils.evaluate import evaluate_policy

    env = make(
        args.env_id, num_envs=args.num_envs,
        repeat_action_probability=args.repeat_action_probability,
    )
    model = MultimodalRecurrentAgent(
        num_actions=env.num_actions, conv_type=args.conv_size,
        attn_type=args.attn_type, fusion_type="sum", input_scale=1.0,
    )
    params = load_run(args.load_from)["train_state"]["params"]
    carry = model.initial_carry(args.num_envs)
    for greedy in (True, False):
        res = jax.jit(
            lambda k, g=greedy: evaluate_policy(
                env, model.apply, params, k,
                num_envs=args.num_envs, num_steps=args.num_steps,
                greedy=g, recurrent=True, initial_carry=carry,
            )
        )(jax.random.PRNGKey(args.seed))
        res = {k: float(v) for k, v in jax.device_get(res).items()}
        tag = "greedy" if greedy else "sampled"
        print(
            f"{tag}: return={res['eval/episodic_return']:.2f} "
            f"length={res['eval/episodic_length']:.1f} "
            f"episodes={int(res['eval/episodes'])}"
        )
    env.close()


if __name__ == "__main__":
    main()
