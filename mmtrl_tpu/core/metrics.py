"""On-device episode statistics + host-side metrics sink.

Stateful gym wrappers (``RecordEpisodeStatistics``) cannot live inside a
jitted program, so episode returns/lengths are tracked in a fixed-shape
PyTree threaded through the rollout scan — the pattern the reference's XLA
path uses (reference: cleanrl/ppo_atari_envpool_xla_jax.py:158-164,206-229,
rationale documented at docs/rl-algorithms/ppo.md:606).

Host side, :class:`MetricsWriter` writes the reference's standardized metric
names (``charts/episodic_return``, ``losses/*``, ``charts/SPS`` — reference:
src/train.py:269-279) to TensorBoard, and mirrors the hyperparameter
markdown table (reference: src/train.py:85-88).
"""

from __future__ import annotations

import time
from typing import Any, Mapping, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EpisodeStatistics:
    """Per-env running episode accumulators, all fixed-shape device arrays."""

    episode_returns: jnp.ndarray  # (num_envs,) running sum of raw rewards
    episode_lengths: jnp.ndarray  # (num_envs,) running step count
    returned_episode_returns: jnp.ndarray  # (num_envs,) last completed return
    returned_episode_lengths: jnp.ndarray  # (num_envs,) last completed length
    episode_count: jnp.ndarray  # () total completed episodes
    sum_returns: jnp.ndarray  # () sum of ALL completed episode returns
    sum_lengths: jnp.ndarray  # () sum of ALL completed episode lengths

    @classmethod
    def create(cls, num_envs: int) -> "EpisodeStatistics":
        z = jnp.zeros(num_envs, dtype=jnp.float32)
        return cls(
            episode_returns=z,
            episode_lengths=z,
            returned_episode_returns=z,
            returned_episode_lengths=z,
            episode_count=jnp.zeros((), dtype=jnp.int32),
            sum_returns=jnp.zeros(()),
            sum_lengths=jnp.zeros(()),
        )

    @property
    def mean_return(self) -> jnp.ndarray:
        """Mean over ALL completed episodes (not just each env's last)."""
        return self.sum_returns / jnp.maximum(self.episode_count, 1)

    @property
    def mean_length(self) -> jnp.ndarray:
        return self.sum_lengths / jnp.maximum(self.episode_count, 1)

    def update(self, reward: jnp.ndarray, done: jnp.ndarray) -> "EpisodeStatistics":
        """Accumulate one vectorized env step (raw, pre-clip rewards)."""
        done_f = done.astype(jnp.float32)
        new_returns = self.episode_returns + reward
        new_lengths = self.episode_lengths + 1.0
        return EpisodeStatistics(
            episode_returns=new_returns * (1.0 - done_f),
            episode_lengths=new_lengths * (1.0 - done_f),
            returned_episode_returns=jnp.where(
                done, new_returns, self.returned_episode_returns
            ),
            returned_episode_lengths=jnp.where(
                done, new_lengths, self.returned_episode_lengths
            ),
            episode_count=self.episode_count + done.astype(jnp.int32).sum(),
            sum_returns=self.sum_returns + jnp.where(done, new_returns, 0.0).sum(),
            sum_lengths=self.sum_lengths + jnp.where(done, new_lengths, 0.0).sum(),
        )


class MetricsWriter:
    """TensorBoard sink with the reference's standardized scalar names."""

    def __init__(self, run_name: str, config: Optional[Any] = None, root: str = "runs"):
        from torch.utils.tensorboard import SummaryWriter  # lazy: heavy import

        self.run_name = run_name
        # The tuner redirects each trial's run dir so its metric read-back
        # never races concurrent runs writing runs/ (utils/tuner.py
        # _run_script; the reference reads back from the script's own run
        # dir the same way, cleanrl_utils/tuner.py:95-101).
        import os

        root = os.environ.get("MMTRL_RUN_ROOT", root)
        self.writer = SummaryWriter(f"{root}/{run_name}")
        self.start_time = time.time()
        # --track: mirror scalars to the wandb-compatible local journal
        # (the reference mirrors TB to wandb, src/train.py:75-83; this
        # environment is zero-egress so the journal is on-disk).
        self.track_run = None
        if config is not None and getattr(config, "track", False):
            import sys

            from mmtrl_tpu.utils import wandb_local

            project = getattr(config, "wandb_project_name", None) or "mmtrl"
            self.track_run = wandb_local.init(
                project, run_name, config=config, argv=sys.argv
            )
        if config is not None:
            import dataclasses

            items = (
                dataclasses.asdict(config).items()
                if dataclasses.is_dataclass(config)
                else vars(config).items()
            )
            table = "|param|value|\n|-|-|\n" + "\n".join(
                f"|{k}|{v}|" for k, v in items
            )
            self.writer.add_text("hyperparameters", table)

    def scalar(self, tag: str, value: Any, step: int) -> None:
        self.writer.add_scalar(tag, float(value), step)
        if self.track_run is not None:
            self.track_run.log({tag: float(value)}, step)

    def scalars(self, values: Mapping[str, Any], step: int) -> None:
        for tag, value in values.items():
            self.scalar(tag, value, step)

    def sps(self, global_step: int) -> float:
        """Windowed steps/sec since the previous call (the cumulative average
        buries compile time); also logs the cumulative value."""
        now = time.time()
        last_step = getattr(self, "_last_step", 0)
        last_time = getattr(self, "_last_time", self.start_time)
        window = (global_step - last_step) / max(now - last_time, 1e-9)
        self._last_step, self._last_time = global_step, now
        self.scalar("charts/SPS", window, global_step)
        self.scalar(
            "charts/SPS_cumulative",
            global_step / max(now - self.start_time, 1e-9),
            global_step,
        )
        return window

    def close(self) -> None:
        self.writer.close()
        if self.track_run is not None:
            self.track_run.finish()
