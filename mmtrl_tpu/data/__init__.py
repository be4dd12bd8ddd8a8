from mmtrl_tpu.data.buffers import ReplayBuffer, PrioritizedReplayBuffer, SumTree

__all__ = ["ReplayBuffer", "PrioritizedReplayBuffer", "SumTree"]
