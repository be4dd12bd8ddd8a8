from mmtrl_tpu.ops.mfcc import MFCCParams, mfcc, mfcc_image, log_mel_spectrogram
from mmtrl_tpu.ops.gae import compute_gae

__all__ = ["MFCCParams", "mfcc", "mfcc_image", "log_mel_spectrogram", "compute_gae"]
