"""MFCC / log-mel audio front-end, numerically matched to python_speech_features.

The reference computes MFCCs host-side with ``python_speech_features.mfcc``
at env init (reference: environments/Minecraft/Minecraft.py:221-243) for the
gridworld's three cached wavs, and plans a streaming path for the ALE
Skeleton+ ROM at 30720 Hz / 10 ms window / 3 ms step (reference:
Config.py:87-89).

This module implements the full pipeline — pre-emphasis, framing, power
spectrum, mel filterbank, log, DCT-II, liftering, energy replacement — with
the exact python_speech_features formulas (default winlen=0.025,
winstep=0.01, numcep=13, nfilt=26, nfft=next_pow2(frame_len), preemph=0.97,
ceplifter=22, appendEnergy=True, rectangular window).

TPU-first design: everything after the rFFT is expressed as two dense
matmuls (power-spectrum @ mel-filterbank, log-mel @ DCT matrix) so XLA maps
it onto the MXU and fuses the elementwise log/lifter in between; the
filterbank and DCT matrices are precomputed constants.  The same function
body runs under numpy (host precompute of the three cached planes) and jnp
(on-device streaming windows inside jit) via the ``xp`` module parameter.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import numpy as np


def _matmul(xp: Any, a, b):
    """Full-precision matmul: the mel/DCT projections are tiny, and the
    default MXU/oneDNN bf16 accumulation costs ~0.1 absolute error after the
    log — force float32 accumulation for numerical parity."""
    if xp is np:
        return a @ b
    import jax

    return xp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


@dataclasses.dataclass(frozen=True)
class MFCCParams:
    samplerate: int = 16000
    winlen: float = 0.025
    winstep: float = 0.01
    numcep: int = 13
    nfilt: int = 26
    nfft: Optional[int] = None
    lowfreq: float = 0.0
    highfreq: Optional[float] = None
    preemph: float = 0.97
    ceplifter: int = 22
    append_energy: bool = True

    @property
    def frame_len(self) -> int:
        return _round_half_up(self.winlen * self.samplerate)

    @property
    def frame_step(self) -> int:
        return _round_half_up(self.winstep * self.samplerate)

    @property
    def fft_size(self) -> int:
        return self.nfft if self.nfft is not None else _next_pow2(self.frame_len)

    @property
    def high(self) -> float:
        return self.highfreq if self.highfreq is not None else self.samplerate / 2.0


# Skeleton+ / ALE streaming audio parameters (reference: Config.py:87-89).
SKELETON_PLUS_PARAMS = MFCCParams(samplerate=30720, winlen=0.010, winstep=0.003)


def mel_filterbank(params: MFCCParams) -> np.ndarray:
    """(nfilt, nfft//2+1) triangular mel filterbank, psf bin quantization."""
    low_mel = hz_to_mel(params.lowfreq)
    high_mel = hz_to_mel(params.high)
    mel_points = np.linspace(low_mel, high_mel, params.nfilt + 2)
    bins = np.floor(
        (params.fft_size + 1) * mel_to_hz(mel_points) / params.samplerate
    ).astype(np.int64)
    fbank = np.zeros((params.nfilt, params.fft_size // 2 + 1), dtype=np.float64)
    for j in range(params.nfilt):
        for i in range(bins[j], bins[j + 1]):
            fbank[j, i] = (i - bins[j]) / max(bins[j + 1] - bins[j], 1)
        for i in range(bins[j + 1], bins[j + 2]):
            fbank[j, i] = (bins[j + 2] - i) / max(bins[j + 2] - bins[j + 1], 1)
    return fbank


def dct2_ortho_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) matrix M with (x @ M) == scipy dct(x, type=2, norm='ortho')[:n_out]."""
    k = np.arange(n_out, dtype=np.float64)[None, :]
    n = np.arange(n_in, dtype=np.float64)[:, None]
    m = 2.0 * np.cos(np.pi * k * (2.0 * n + 1.0) / (2.0 * n_in))
    scale = np.full((1, n_out), np.sqrt(1.0 / (2.0 * n_in)))
    scale[0, 0] = np.sqrt(1.0 / (4.0 * n_in))
    return m * scale


def lifter_coeffs(params: MFCCParams) -> np.ndarray:
    if params.ceplifter <= 0:
        return np.ones(params.numcep, dtype=np.float64)
    n = np.arange(params.numcep, dtype=np.float64)
    return 1.0 + (params.ceplifter / 2.0) * np.sin(np.pi * n / params.ceplifter)


def _num_frames(slen: int, params: MFCCParams) -> int:
    if slen <= params.frame_len:
        return 1
    return 1 + int(
        math.ceil((slen - params.frame_len) / float(params.frame_step))
    )


def mfcc(signal, params: MFCCParams = MFCCParams(), xp: Any = np):
    """(num_frames, numcep) MFCC features of a 1-D signal.

    ``xp`` selects the array backend: numpy (host) or jax.numpy (device,
    jittable — all shapes depend only on len(signal) and params).
    """
    sig = xp.asarray(signal, dtype=xp.float64 if xp is np else xp.float32)
    # Pre-emphasis: y[0]=x[0], y[t]=x[t]-a*x[t-1].
    sig = xp.concatenate([sig[:1], sig[1:] - params.preemph * sig[:-1]])
    slen = int(sig.shape[0])
    nframes = _num_frames(slen, params)
    flen, fstep = params.frame_len, params.frame_step
    pad = (nframes - 1) * fstep + flen - slen
    sig = xp.concatenate([sig, xp.zeros(max(pad, 0), dtype=sig.dtype)])
    idx = (
        np.arange(nframes)[:, None] * fstep + np.arange(flen)[None, :]
    )  # static gather indices
    frames = sig[idx]
    # Power spectrum (psf: 1/NFFT * |rfft|^2), rectangular window.
    spec = xp.fft.rfft(frames, n=params.fft_size, axis=-1)
    pspec = (spec.real**2 + spec.imag**2) / params.fft_size
    energy = xp.sum(pspec, axis=-1)
    eps = xp.finfo(xp.float64 if xp is np else xp.float32).eps
    energy = xp.where(energy == 0, eps, energy)
    fbank = xp.asarray(mel_filterbank(params), dtype=pspec.dtype)
    feat = _matmul(xp, pspec, fbank.T)  # MXU matmul on device
    feat = xp.where(feat == 0, eps, feat)
    feat = xp.log(feat)
    dct_m = xp.asarray(
        dct2_ortho_matrix(params.nfilt, params.numcep), dtype=feat.dtype
    )
    feat = _matmul(xp, feat, dct_m)  # second MXU matmul
    feat = feat * xp.asarray(lifter_coeffs(params), dtype=feat.dtype)
    if params.append_energy:
        feat = xp.concatenate([xp.log(energy)[:, None], feat[:, 1:]], axis=-1)
    return feat


def log_mel_spectrogram(signal, params: MFCCParams = MFCCParams(), xp: Any = np):
    """(num_frames, nfilt) log-mel features (the Skeleton+ embedding path)."""
    sig = xp.asarray(signal, dtype=xp.float64 if xp is np else xp.float32)
    sig = xp.concatenate([sig[:1], sig[1:] - params.preemph * sig[:-1]])
    slen = int(sig.shape[0])
    nframes = _num_frames(slen, params)
    pad = (nframes - 1) * params.frame_step + params.frame_len - slen
    sig = xp.concatenate([sig, xp.zeros(max(pad, 0), dtype=sig.dtype)])
    idx = np.arange(nframes)[:, None] * params.frame_step + np.arange(
        params.frame_len
    )[None, :]
    frames = sig[idx]
    spec = xp.fft.rfft(frames, n=params.fft_size, axis=-1)
    pspec = (spec.real**2 + spec.imag**2) / params.fft_size
    fbank = xp.asarray(mel_filterbank(params), dtype=pspec.dtype)
    feat = _matmul(xp, pspec, fbank.T)
    eps = xp.finfo(xp.float64 if xp is np else xp.float32).eps
    return xp.log(xp.where(feat == 0, eps, feat))


def mfcc_image(
    signal: np.ndarray,
    samplerate: int,
    size: int = 84,
) -> np.ndarray:
    """wav -> (size, size) float MFCC image in [-1, 1].

    Mirrors the reference's cached-plane pipeline exactly: mfcc -> swapaxes
    so time runs along x -> PIL bicubic resize -> min-max normalize to
    [-1, 1] (reference: environments/Minecraft/Minecraft.py:231-243).
    Host-side, init-time only — the result is a constant plane selected
    on-device per step.
    """
    from PIL import Image

    feat = mfcc(signal, MFCCParams(samplerate=samplerate), xp=np)
    feat = np.swapaxes(feat, 0, 1)
    img = np.array(
        Image.fromarray(feat).resize(size=(size, size), resample=Image.BICUBIC)
    )
    lo, hi = img.min(), img.max()
    img = (img - lo) / (hi - lo)
    return (img * 2.0 - 1.0).astype(np.float32)
