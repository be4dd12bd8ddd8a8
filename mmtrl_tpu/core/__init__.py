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
