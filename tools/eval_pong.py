"""Match-play evaluation of a self-play-trained PONG policy vs fixed opponents.

Self-play training (scripts/ppo_ma_pong.py) has zero-sum rewards, so its
training curve cannot show absolute strength.  This tool plays the saved
shared policy as PLAYER 0 against a fixed PLAYER 1 opponent on the real
cartridge and reports per-episode points for/against, the score
differential, and the episode win rate — the honest MA learning evidence
(reference contract: cleanrl/ppo_pettingzoo_ma_atari.py evaluates the
shared policy the same way, via match outcomes).

Opponents:
  noop     right paddle never moves (measures serving/aim ability)
  random   uniform random actions
  tracker  scripted ball-follower via cartridge RAM ($84 BALLY / $88 PAD1Y)
           — the same heuristic that beats an idle paddle 21-0
  self     mirror match (the policy plays both sides; diff ≈ 0 expected)

Both action rules (greedy argmax and sampled) are reported, as in
tools/eval_rom_policy.py.

    JAX_PLATFORMS=cpu python tools/eval_pong.py \
        --load-from saved_agents/pong_ma_native__ppo_ma_pong__1__<ts> \
        --opponent tracker --num-envs 8 --num-steps 3000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--load-from", required=True)
    p.add_argument(
        "--opponent", default="tracker",
        choices=["noop", "random", "tracker", "self"],
    )
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=3000)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--conv-size", default="small")
    p.add_argument("--attn-type", default="casl")
    p.add_argument("--episode-steps", type=int, default=1500)
    p.add_argument("--repeat-action-probability", type=float, default=0.0)
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mmtrl_tpu.core.checkpoint import load_run
    from mmtrl_tpu.envs.pong_ma import NativePong2P
    from mmtrl_tpu.models import MultimodalRecurrentAgent

    n = args.num_envs
    env = NativePong2P(
        num_envs=n, seed=args.seed, episode_steps=args.episode_steps,
        repeat_action_probability=args.repeat_action_probability,
    )
    model = MultimodalRecurrentAgent(
        num_actions=env.num_actions, conv_type=args.conv_size,
        attn_type=args.attn_type, fusion_type="sum", input_scale=1.0,
    )
    params = load_run(args.load_from)["train_state"]["params"]

    def policy_call(params, obs, done, carry, key, greedy):
        logits, _, new_carry = model.apply(params, obs[None], done[None], carry)
        a_greedy = jnp.argmax(logits[0], axis=-1)
        a_sample = jax.random.categorical(key, logits[0], axis=-1)
        return jnp.where(greedy, a_greedy, a_sample), new_carry

    policy_jit = jax.jit(policy_call, static_argnames=("greedy",))
    obs_jit = jax.jit(env._obs)
    rng = np.random.default_rng(args.seed)

    for greedy in (True, False):
        frames, audio = env._host_reset()
        n_slots = env.num_slots
        carry = model.initial_carry(n_slots)
        done_slots = np.zeros(n_slots, np.uint8)
        key = jax.random.PRNGKey(args.seed)
        pts_for = np.zeros(n, np.int64)
        pts_against = np.zeros(n, np.int64)
        ep_diff, ep_for, ep_against, wins = [], [], [], 0
        for _ in range(args.num_steps):
            obs = obs_jit(frames, audio)  # (2n, 3, 84, 84)
            key, k_act = jax.random.split(key)
            acts_all, carry = policy_jit(
                params, obs, jnp.asarray(done_slots.astype(bool)),
                carry, k_act, greedy,
            )
            acts_all = np.asarray(acts_all)
            actions = np.zeros((n, 2), np.int32)
            actions[:, 0] = acts_all[0::2]  # policy drives player 0
            if args.opponent == "self":
                actions[:, 1] = acts_all[1::2]
            elif args.opponent == "random":
                actions[:, 1] = rng.integers(0, env.num_actions, n)
            elif args.opponent == "tracker":
                ram = env.ram()
                bally = ram[:, 4].astype(np.int32)
                p1y = ram[:, 8].astype(np.int32)
                actions[:, 1] = np.where(bally + 2 < p1y + 8, 3, 4)
            # noop: leave zeros
            frames, audio, kd, _, done2, _, own, opp = env._host_step(
                actions.reshape(-1)
            )
            done_slots = done2
            sd0 = kd[0::2]  # own-minus-opp for slot 0
            pts_for += np.maximum(sd0, 0)
            pts_against += np.maximum(-sd0, 0)
            done_env = done2[0::2].astype(bool)
            for i in np.nonzero(done_env)[0]:
                ep_for.append(int(pts_for[i]))
                ep_against.append(int(pts_against[i]))
                ep_diff.append(int(pts_for[i] - pts_against[i]))
                wins += int(pts_for[i] > pts_against[i])
                pts_for[i] = 0
                pts_against[i] = 0
        tag = "greedy" if greedy else "sampled"
        if ep_diff:
            print(
                f"{tag} vs {args.opponent}: diff={np.mean(ep_diff):+.2f} "
                f"for={np.mean(ep_for):.2f} against={np.mean(ep_against):.2f} "
                f"winrate={wins / len(ep_diff):.2f} episodes={len(ep_diff)}"
            )
        else:
            print(f"{tag} vs {args.opponent}: no completed episodes")
    env.close()


if __name__ == "__main__":
    main()
