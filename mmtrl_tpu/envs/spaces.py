"""Minimal jittable space descriptions (gym-compatible surface).

The reference declares spaces with gym's Box/Discrete (reference:
environments/Minecraft/Minecraft.py:57-58).  These carry the same fields but
are plain dataclasses whose ``sample`` takes an explicit PRNG key, usable
inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Discrete:
    n: int
    dtype: np.dtype = np.int32

    @property
    def shape(self) -> Tuple[int, ...]:
        return ()

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return jax.random.randint(key, (), 0, self.n, dtype=jnp.int32)

    def contains(self, x) -> bool:
        return bool(0 <= int(x) < self.n)


@dataclasses.dataclass(frozen=True)
class Box:
    low: Union[float, np.ndarray]
    high: Union[float, np.ndarray]
    shape: Tuple[int, ...]
    dtype: np.dtype = np.float32

    def sample(self, key: jax.Array) -> jnp.ndarray:
        lo = jnp.broadcast_to(jnp.asarray(self.low, self.dtype), self.shape)
        hi = jnp.broadcast_to(jnp.asarray(self.high, self.dtype), self.shape)
        return jax.random.uniform(key, self.shape, self.dtype, lo, hi)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(
            x.shape == self.shape and np.all(x >= self.low) and np.all(x <= self.high)
        )
