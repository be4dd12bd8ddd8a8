"""Render a greedy episode of the ROM-trained Skeleton+ agent as a GIF.

Loads the committed 5.9M-step Orbax checkpoint (runs_mujoco/ckpt_rom_hl5),
plays the real SkelPlus.bin cartridge on the native 2600 core with one env,
taps the raw (192, 160) TIA color-index frames out of the host stepper, and
writes an RGB animated GIF through an NTSC-synthesis display palette.

The RL observation path uses luma only (envs/skeleton_native.py::_luma_lut);
the palette here is a standard YIQ hue-wheel approximation of the 2600's
NTSC output (bits 6-3 of COLUxx>>1 = 16 hues, bits 2-0 = 8 luma levels) —
display-only, not part of any training or evaluation contract.

    JAX_PLATFORMS=cpu python tools/rom_gif.py \
        --load-from runs_mujoco/ckpt_rom_hl5 --out docs/assets/skelplus_rom.gif
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def ntsc_palette() -> np.ndarray:
    """(128, 3) uint8: 7-bit TIA color index -> approximate NTSC RGB."""
    pal = np.zeros((128, 3), np.float32)
    for idx in range(128):
        hue, luma = idx >> 3, idx & 7
        y = 0.12 + 0.82 * luma / 7.0
        if hue == 0:
            i = q = 0.0
        else:
            phase = np.deg2rad(270.0 - (hue - 1) * 25.7)
            sat = 0.28
            i, q = sat * np.cos(phase), sat * np.sin(phase)
        r = y + 0.956 * i + 0.621 * q
        g = y - 0.272 * i - 0.647 * q
        b = y - 1.106 * i + 1.703 * q
        pal[idx] = (r, g, b)
    return (np.clip(pal, 0.0, 1.0) * 255).astype(np.uint8)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--load-from", default="runs_mujoco/ckpt_rom_hl5")
    p.add_argument("--out", default="docs/assets/skelplus_rom.gif")
    p.add_argument("--env-id", default="skeleton_plus_native",
                   help="skeleton_plus_native | rally_native | brick_native")
    p.add_argument("--policy-kind", default="ppo", choices=("ppo", "dqn", "c51"),
                   help="checkpoint kind: recurrent PPO actor or hostloop_dqn "
                        "value net (greedy argmax-Q, dt_rom.py loader semantics)")
    p.add_argument("--n-atoms", type=int, default=51)
    p.add_argument("--v-min", type=float, default=-10.0)
    p.add_argument("--v-max", type=float, default=10.0)
    p.add_argument("--steps", type=int, default=1500, help="env-step cap")
    p.add_argument("--stride", type=int, default=3, help="keep every Nth frame")
    p.add_argument("--fps", type=int, default=20)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    # The env var alone is not honored when an axon TPU plugin is installed;
    # force the backend the same way core/config.py:98 does for --platform.
    jax.config.update("jax_platforms", "cpu")

    from mmtrl_tpu.core.checkpoint import load_run
    from mmtrl_tpu.envs import make
    from mmtrl_tpu.utils.video import write_gif

    env = make(args.env_id, num_envs=1)
    restored = load_run(args.load_from)
    # Fail with a clear message on a kind/checkpoint mismatch instead of an
    # opaque KeyError('params')/flax shape error downstream: PPO runs save
    # {'train_state': {...}}, the hostloop value trainers save the raw
    # DQNTrainState with 'params' at top level.
    looks_ppo = isinstance(restored, dict) and "train_state" in restored
    looks_value = isinstance(restored, dict) and "params" in restored
    if args.policy_kind == "ppo" and not looks_ppo:
        raise SystemExit(
            f"--policy-kind ppo but {args.load_from} has top-level keys "
            f"{sorted(restored)} (expected 'train_state'). Hostloop DQN/C51 "
            "checkpoints need --policy-kind dqn|c51."
        )
    if args.policy_kind != "ppo" and not looks_value:
        raise SystemExit(
            f"--policy-kind {args.policy_kind} but {args.load_from} has "
            f"top-level keys {sorted(restored)} (expected 'params'). PPO "
            "checkpoints need --policy-kind ppo."
        )
    if args.policy_kind == "ppo":
        from mmtrl_tpu.models import MultimodalRecurrentAgent

        model = MultimodalRecurrentAgent(
            num_actions=env.num_actions, conv_type="small", attn_type="casl",
            fusion_type="sum", input_scale=1.0,
        )
        params = restored["train_state"]["params"]
    else:
        # hostloop_dqn saves the raw DQNTrainState pytree: params at top level.
        from mmtrl_tpu.models import DistributionalQNetwork, QNetwork

        params = restored["params"]
        if args.policy_kind == "dqn":
            model = QNetwork(num_actions=env.num_actions, input_scale=1.0)
        else:
            model = DistributionalQNetwork(
                num_actions=env.num_actions, n_atoms=args.n_atoms,
                input_scale=1.0,
            )

    raw_frames = []
    host_step = env._host_step

    def tap(actions):
        out = host_step(actions)
        raw_frames.append(np.asarray(out[0][0]).copy())  # (192, 160) indices
        return out

    env._host_step = tap

    if args.policy_kind == "ppo":

        @jax.jit
        def policy(params, obs, done, carry):
            logits, _, carry = model.apply(params, obs[None], done[None], carry)
            return jnp.argmax(logits[0], axis=-1), carry

    elif args.policy_kind == "dqn":

        @jax.jit
        def policy(params, obs, done, carry):
            return jnp.argmax(model.apply(params, obs), axis=-1), carry

    else:
        atoms = jnp.linspace(args.v_min, args.v_max, args.n_atoms)

        @jax.jit
        def policy(params, obs, done, carry):
            q = (model.apply(params, obs) * atoms).sum(axis=-1)
            return jnp.argmax(q, axis=-1), carry

    env_step = jax.jit(env.v_step)

    key = jax.random.PRNGKey(args.seed)
    key, k_reset = jax.random.split(key)
    obs, env_state = env.v_reset(jax.random.split(k_reset, 1))
    done = jnp.zeros(1, dtype=bool)
    carry = model.initial_carry(1) if args.policy_kind == "ppo" else None
    ep_return, t = 0.0, 0
    for t in range(args.steps):
        action, carry = policy(params, obs, done, carry)
        key, k_step = jax.random.split(key)
        obs, env_state, reward, done, _ = env_step(
            jax.random.split(k_step, 1), env_state, action
        )
        ep_return += float(reward[0])
        if bool(done[0]):
            break
    env.close()

    pal = ntsc_palette()
    frames = np.stack(raw_frames[:: args.stride])  # (T, 192, 160) indices
    rgb = pal[np.clip(frames, 0, 127)]  # (T, 192, 160, 3)
    rgb = np.repeat(rgb, 2, axis=2)  # TIA pixels are ~2:1 wide -> (T,192,320)
    path = write_gif(rgb, args.out, fps=args.fps, size=None)
    print(
        f"wrote {path}: {rgb.shape[0]} frames, episode return {ep_return:.2f} "
        f"over {t + 1} steps (done={bool(done[0])})"
    )


if __name__ == "__main__":
    main()
