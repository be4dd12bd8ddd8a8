import os as _os

import jax as _jax

# Persistent compilation cache: the scanned programs compile for minutes on
# the TPU; cache hits make re-runs start in seconds.
try:
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/mmtrl_jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

from mmtrl_tpu.core.config import cli, flag_name
from mmtrl_tpu.core.metrics import EpisodeStatistics, MetricsWriter
from mmtrl_tpu.core.checkpoint import save_run, load_run

__all__ = [
    "cli",
    "flag_name",
    "EpisodeStatistics",
    "MetricsWriter",
    "save_run",
    "load_run",
]
