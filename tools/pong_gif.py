"""Render a PONG match (trained policy vs a fixed opponent) as a GIF.

Plays the saved self-play policy as PLAYER 0 (left paddle) against a
chosen opponent on the real two-player cartridge (native/homebrew/pong.asm)
and writes the raw TIA frames through the NTSC display palette
(tools/rom_gif.py — display-only, not a training/eval contract).

    JAX_PLATFORMS=cpu python tools/pong_gif.py \
        --load-from saved_agents/pong_ma_native__pong_ma_s1__1__<ts> \
        --opponent tracker --out docs/assets/pong_match.gif
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rom_gif import ntsc_palette  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--load-from", required=True)
    p.add_argument(
        "--opponent", default="tracker", choices=["noop", "random", "tracker"]
    )
    p.add_argument("--out", default="docs/assets/pong_match.gif")
    p.add_argument("--steps", type=int, default=900, help="env-step cap")
    p.add_argument("--stride", type=int, default=2, help="keep every Nth frame")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--sampled", action="store_true",
                   help="sample actions instead of argmax")
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrl_tpu.core.checkpoint import load_run
    from mmtrl_tpu.envs.pong_ma import NativePong2P
    from mmtrl_tpu.models import MultimodalRecurrentAgent
    from mmtrl_tpu.utils.video import write_gif

    env = NativePong2P(num_envs=1, seed=args.seed, episode_steps=args.steps)
    model = MultimodalRecurrentAgent(
        num_actions=env.num_actions, conv_type="small", attn_type="casl",
        fusion_type="sum", input_scale=1.0,
    )
    params = load_run(args.load_from)["train_state"]["params"]

    @jax.jit
    def policy(params, obs, done, carry, key):
        logits, _, carry = model.apply(params, obs[None], done[None], carry)
        a_greedy = jnp.argmax(logits[0], axis=-1)
        a_sample = jax.random.categorical(key, logits[0], axis=-1)
        return a_greedy, a_sample, carry

    obs_jit = jax.jit(env._obs)
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    raw_frames = []
    frames, audio = env._host_reset()
    done_slots = np.zeros(2, np.uint8)
    carry = model.initial_carry(2)
    pts_for = pts_against = 0
    for t in range(args.steps):
        obs = obs_jit(frames, audio)
        key, k_act = jax.random.split(key)
        ag, asamp, carry = policy(
            params, obs, jnp.asarray(done_slots.astype(bool)), carry, k_act
        )
        acts_all = np.asarray(asamp if args.sampled else ag)
        actions = np.zeros(2, np.int32)
        actions[0] = acts_all[0]
        if args.opponent == "random":
            actions[1] = rng.integers(0, env.num_actions)
        elif args.opponent == "tracker":
            ram = env.ram()
            actions[1] = 3 if int(ram[0, 4]) + 2 < int(ram[0, 8]) + 8 else 4
        frames, audio, kd, _, done2, *_ = env._host_step(actions)
        raw_frames.append(frames[0].copy())
        done_slots = done2
        pts_for += max(int(kd[0]), 0)
        pts_against += max(-int(kd[0]), 0)
        if done2[0]:
            break
    env.close()

    pal = ntsc_palette()
    stack = np.stack(raw_frames[:: args.stride])
    rgb = pal[np.clip(stack, 0, 127)]
    rgb = np.repeat(rgb, 2, axis=2)  # TIA pixels are ~2:1 wide
    path = write_gif(rgb, args.out, fps=args.fps, size=None)
    print(
        f"wrote {path}: {rgb.shape[0]} frames, match {pts_for}-{pts_against} "
        f"vs {args.opponent} over {t + 1} steps"
    )


if __name__ == "__main__":
    main()
