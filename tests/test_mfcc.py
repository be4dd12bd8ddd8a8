"""Audio front-end tests: numpy/jnp parity + pipeline invariants.

Generalizes the reference's one numerical-parity test pattern
(reference: tests/test_jax_compute_gae.py — scan must equal loop) to the
audio path: the device (jnp) MFCC must match the host (numpy) MFCC.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mmtrl_tpu.ops.mfcc import (
    MFCCParams,
    SKELETON_PLUS_PARAMS,
    dct2_ortho_matrix,
    log_mel_spectrogram,
    mel_filterbank,
    mfcc,
    mfcc_image,
)


def test_numpy_jnp_parity():
    sig = np.random.RandomState(0).randn(16000) * 1000
    f_np = mfcc(sig, xp=np)
    f_jnp = np.asarray(mfcc(jnp.asarray(sig, dtype=jnp.float32), xp=jnp))
    assert f_np.shape == f_jnp.shape == (99, 13)
    # float32 device path vs float64 host path
    np.testing.assert_allclose(f_np, f_jnp, rtol=2e-3, atol=2e-3)


def test_dct_matrix_matches_scipy():
    from scipy.fftpack import dct

    x = np.random.RandomState(1).randn(5, 26)
    ours = x @ dct2_ortho_matrix(26, 13)
    ref = dct(x, type=2, axis=1, norm="ortho")[:, :13]
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


def test_filterbank_shape_and_coverage():
    p = MFCCParams()
    fb = mel_filterbank(p)
    assert fb.shape == (26, 257)
    assert (fb >= 0).all()
    # Every filter has support
    assert (fb.sum(axis=1) > 0).all()


def test_skeleton_plus_params():
    # 30720 Hz, 10 ms window, 3 ms step (reference: Config.py:87-89)
    p = SKELETON_PLUS_PARAMS
    assert p.frame_len == 307
    assert p.frame_step == 92
    assert p.fft_size == 512
    sig = np.random.RandomState(2).randn(30720)
    feat = mfcc(sig, p, xp=np)
    assert feat.shape[1] == 13
    # num frames: 1 + ceil((30720-307)/92)
    assert feat.shape[0] == 1 + int(np.ceil((30720 - 307) / 92))


def test_log_mel_spectrogram():
    sig = np.random.RandomState(3).randn(8000)
    feat = log_mel_spectrogram(sig, xp=np)
    assert feat.shape[1] == 26
    assert np.isfinite(feat).all()


def test_mfcc_image_range_and_shape():
    sig = (np.random.RandomState(4).randn(16000) * 10000).astype(np.int16)
    img = mfcc_image(sig, 16000)
    assert img.shape == (84, 84)
    assert img.dtype == np.float32
    assert img.min() == pytest.approx(-1.0)
    assert img.max() == pytest.approx(1.0)


def test_energy_replaces_c0():
    p = MFCCParams(append_energy=True)
    sig = np.random.RandomState(5).randn(4000)
    with_e = mfcc(sig, p, xp=np)
    without_e = mfcc(sig, MFCCParams(append_energy=False), xp=np)
    # c1..c12 identical, c0 differs
    np.testing.assert_allclose(with_e[:, 1:], without_e[:, 1:])
    assert not np.allclose(with_e[:, 0], without_e[:, 0])
