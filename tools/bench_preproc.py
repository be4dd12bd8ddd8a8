#!/usr/bin/env python
"""Secondary benchmark: multimodal observation preprocessing throughput.

BASELINE.json's metric names both DT tokens/sec (bench.py) and "video frames
+ audio windows preproc/sec".  This measures the observation-synthesis path
in isolation: vectorized env stepping with the on-device render einsum and
audio select (Minecraft2d) and the streaming stereo MFCC (Skeleton+).

    python tools/bench_preproc.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench_env(env_id: str, num_envs: int, iters: int = 50) -> float:
    from mmtrl_tpu.envs import make

    env = make(env_id)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_envs)
    obs, state = jax.jit(env.v_reset)(keys)
    actions = jnp.zeros(num_envs, jnp.int32)

    @jax.jit
    def chunk(keys, state):
        def body(carry, _):
            keys, state = carry
            obs, state, r, d, _ = env.v_step(keys, state, actions)
            return (keys, state), obs[0, 0, 0]

        (keys, state), probe = jax.lax.scan(body, (keys, state), None, length=32)
        return keys, state, probe

    keys, state, probe = chunk(keys, state)  # compile
    float(jnp.sum(probe))  # FETCH: on the remote-tunnel backend,
    # block_until_ready returns before execution completes; only a value
    # fetch waits.  probe depends on the chained env state, so the final
    # fetch times every chunk.
    t0 = time.perf_counter()
    for _ in range(iters):
        keys, state, probe = chunk(keys, state)
    float(jnp.sum(probe))
    dt = time.perf_counter() - t0
    return num_envs * 32 * iters / dt


def main():
    minecraft = bench_env("minecraft", 2048)
    skeleton = bench_env("skeleton_plus", 512)
    print(
        json.dumps(
            {
                "minecraft2d_obs_per_sec": round(minecraft),
                "skeleton_plus_obs_per_sec": round(skeleton),
                "note": (
                    "each obs = render einsum + audio plane (minecraft) or "
                    "stereo synth + streaming MFCC (skeleton+), on device"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
