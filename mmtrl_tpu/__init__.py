"""MMTRL-TPU: a TPU-native multimodal transformer RL framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
hopl1t/multimodal-transformer-rl (CleanRL fork + multimodal video/audio RL
stack + offline decision transformer).  Nothing in here is a port: the
reference's CPU/CUDA/torch architecture (host-side envs, python rollout
loops, torch.distributed all-reduce) is replaced by device-resident
vectorized environments, single-program scanned training steps, mesh
shardings over ICI, and Pallas kernels on the hot paths.

Layout
------
core/      config dataclasses + CleanRL-flag-compatible CLI, PRNG plumbing,
           on-device episode statistics, Orbax checkpointing
parallel/  jax.sharding Mesh construction + named-axis sharding rules
envs/      pure-JAX device-resident environments (Minecraft2d, Doorpuzzle,
           classic control) behind a functional gymnax-style API
ops/       Pallas/jnp kernels: MFCC audio front-end, causal flash
           attention, GAE scan
models/    flax modules: Atari CNN towers, done-masked scan LSTM,
           crossmodal attention, actor-critic heads, decision transformer
algos/     scan-structured trainers: PPO family, DQN/C51/DDPG/TD3/SAC,
           offline decision transformer
data/      replay buffers (uniform + prioritized sum-tree), rollout
           storage, trajectory datasets
utils/     benchmark fleet runner, tuner, plotting, resume tooling
"""

__version__ = "0.1.0"
