"""Procedural assets + linearized render bank for the gridworld envs.

The reference renders every step host-side: paste 20x20 RGB tile PNGs onto a
104x104 canvas, cv2 RGB->gray, cv2 bicubic resize to 84x84, then scale to
[-1, 1] (reference: environments/Minecraft/Minecraft.py:247-354).  The whole
pipeline after tile selection is LINEAR in the tile placement, so here it is
precomputed once on host into a contribution bank

    C[cell, tile] = resize84(gray(canvas with `tile` alone at `cell`))

and the per-step on-device render collapses to one tiny einsum

    frame = (one_hot(tile_map) * C).sum over (cell, tile) * 2/255 - 1

— a single MXU-friendly contraction per env per step, no host round-trip.
(The affine *2/255-1 is applied after the sum; the black boundary contributes
zero.)  Grayscale/resize run in float, so the decomposition is exact.

Tiles and wavs are synthesized procedurally (deterministic): the reference's
PNG/WAV assets are licensed third-party art and are not copied.  Gameplay
semantics are preserved exactly — what matters to the agent is that tile
classes are visually distinct, that the gem is always drawn as its "gold"
variant so ONLY audio disambiguates gem type (Minecraft.py:311-318), and
that the three audio planes are distinct MFCC images.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from mmtrl_tpu.ops.mfcc import mfcc_image

CELL = 20  # tile pixel size (reference: Config.py:75 PIXEL_SIZE)
GRID = 5  # rows == cols (reference: Config.py:73-74)
BORDER = 2  # boundary pixels (reference: Minecraft.py:248)
IMG = 84  # network input (reference: Config.py:137-138)
CANVAS = GRID * CELL + 2 * BORDER  # 104

# Minecraft tile ids (render priority agent > good > bad > gem > stone,
# reference: Minecraft.py:301-320).
T_STONE, T_AGENT, T_GOOD, T_BAD, T_GEM = range(5)
N_TILES = 5

# Doorpuzzle simple-render tile ids / gray values
# (reference: Doorpuzzle.py:289-296; canvas background is 125, boundary 0,
# Doorpuzzle.py:384-390).
DP_BG, DP_AGENT, DP_T1, DP_T2, DP_KEY1, DP_KEY2, DP_OBSTACLE = range(7)
DP_N_TILES = 7
DP_GRAY = {
    DP_BG: 128.0,
    DP_KEY1: 0.0,
    DP_T1: 50.0,
    DP_KEY2: 235.0,
    DP_T2: 185.0,
    DP_AGENT: 255.0,
    DP_OBSTACLE: 100.0,
}


# --------------------------------------------------------------------------
# Procedural tiles (Minecraft)
# --------------------------------------------------------------------------
def _stone_texture(rng: np.random.RandomState) -> np.ndarray:
    base = rng.randint(95, 135, size=(CELL, CELL, 1)).astype(np.float32)
    return np.repeat(base, 3, axis=2)


def _draw_disk(img, cy, cx, r, color):
    yy, xx = np.mgrid[0:CELL, 0:CELL]
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r**2
    img[mask] = color
    return img


def _draw_rect(img, y0, y1, x0, x1, color):
    img[y0:y1, x0:x1] = color
    return img


@functools.lru_cache(maxsize=1)
def minecraft_tiles() -> np.ndarray:
    """(N_TILES, CELL, CELL, 3) float32 RGB tiles in [0, 255]."""
    rng = np.random.RandomState(7)
    stone = _stone_texture(rng)

    agent = stone.copy()  # humanoid: head + torso + legs
    _draw_disk(agent, 5, 10, 3, (224.0, 172.0, 105.0))
    _draw_rect(agent, 8, 14, 7, 13, (40.0, 90.0, 200.0))
    _draw_rect(agent, 14, 18, 7, 9, (60.0, 40.0, 20.0))
    _draw_rect(agent, 14, 18, 11, 13, (60.0, 40.0, 20.0))

    good = stone.copy()  # gold pickaxe: bright diagonal + handle
    for i in range(4, 16):
        good[i, 19 - i] = (250.0, 200.0, 30.0)
        good[i, min(20 - i, 19)] = (250.0, 200.0, 30.0)
    _draw_rect(good, 10, 18, 9, 11, (130.0, 80.0, 30.0))

    bad = stone.copy()  # bronze shovel: vertical handle + blade
    _draw_rect(bad, 3, 13, 9, 11, (150.0, 95.0, 60.0))
    _draw_rect(bad, 13, 18, 7, 13, (180.0, 180.0, 190.0))

    gem = stone.copy()  # gold-flecked stone (always gold, audio disambiguates)
    flecks = np.random.RandomState(21)
    for _ in range(14):
        y, x = flecks.randint(2, CELL - 2, size=2)
        gem[y : y + 2, x : x + 2] = (245.0, 190.0, 40.0)

    return np.stack([stone, agent, good, bad, gem]).astype(np.float32)


# --------------------------------------------------------------------------
# Linearized render bank
# --------------------------------------------------------------------------
def _resize_matrices() -> Tuple[np.ndarray, np.ndarray]:
    """(IMG, CANVAS) row/col bicubic interpolation matrices matching cv2.

    cv2.resize is a separable linear map on float images, so resizing the
    identity basis recovers its weight matrix exactly.
    """
    import cv2

    eye = np.eye(CANVAS, dtype=np.float32)
    w_row = cv2.resize(eye, (CANVAS, IMG), interpolation=cv2.INTER_CUBIC)
    return w_row, w_row  # square canvas: same weights for rows and cols


def _gray(img: np.ndarray) -> np.ndarray:
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(np.float32)


@functools.lru_cache(maxsize=1)
def minecraft_render_bank() -> np.ndarray:
    """(GRID*GRID, N_TILES, IMG, IMG) float32 contribution bank.

    frame84 = einsum('pt,ptyx->yx', one_hot(tile_map), bank) * 2/255 - 1
    """
    tiles_gray = _gray(minecraft_tiles())  # (N_TILES, CELL, CELL)
    w_row, w_col = _resize_matrices()
    bank = np.zeros((GRID * GRID, N_TILES, IMG, IMG), dtype=np.float32)
    for p in range(GRID * GRID):
        r, c = divmod(p, GRID)
        canvas = np.zeros((CANVAS, CANVAS), dtype=np.float32)
        y0, x0 = r * CELL + BORDER, c * CELL + BORDER
        for t in range(N_TILES):
            canvas[y0 : y0 + CELL, x0 : x0 + CELL] = tiles_gray[t]
            bank[p, t] = w_row @ canvas @ w_col.T
        canvas[y0 : y0 + CELL, x0 : x0 + CELL] = 0.0
    return bank


@functools.lru_cache(maxsize=1)
def doorpuzzle_render_bank() -> np.ndarray:
    """(GRID*GRID, DP_N_TILES, IMG, IMG) bank + the constant 125-gray canvas.

    Doorpuzzle's simple render resizes with INTER_NEAREST
    (Doorpuzzle.py:377); nearest is also linear over tile placement, and
    the canvas base is 125 (not 0), handled by `doorpuzzle_base_frame`.
    """
    import cv2

    w = np.zeros((IMG, CANVAS), dtype=np.float32)
    nearest = cv2.resize(
        np.eye(CANVAS, dtype=np.float32), (CANVAS, IMG), interpolation=cv2.INTER_NEAREST
    )
    w[:] = nearest
    bank = np.zeros((GRID * GRID, DP_N_TILES, IMG, IMG), dtype=np.float32)
    for p in range(GRID * GRID):
        r, c = divmod(p, GRID)
        canvas = np.zeros((CANVAS, CANVAS), dtype=np.float32)
        y0, x0 = r * CELL + BORDER, c * CELL + BORDER
        for t in range(DP_N_TILES):
            canvas[y0 : y0 + CELL, x0 : x0 + CELL] = DP_GRAY[t]
            bank[p, t] = w @ canvas @ w.T
        canvas[y0 : y0 + CELL, x0 : x0 + CELL] = 0.0
    return bank


@functools.lru_cache(maxsize=1)
def doorpuzzle_base_frame() -> np.ndarray:
    """(IMG, IMG) resized base canvas: 125 everywhere, 0 on the 2px boundary.

    Cell interiors are fully overwritten by tiles, so the base contributes
    only boundary/inter-cell pixels; subtracting the cell regions' 125 is
    folded in by building the base with cell interiors already zeroed.
    """
    import cv2

    canvas = np.full((CANVAS, CANVAS), 125.0, dtype=np.float32)
    canvas[:BORDER, :] = 0.0
    canvas[:, :BORDER] = 0.0
    canvas[-BORDER:, :] = 0.0
    canvas[:, -BORDER:] = 0.0
    for p in range(GRID * GRID):
        r, c = divmod(p, GRID)
        canvas[
            r * CELL + BORDER : (r + 1) * CELL + BORDER,
            c * CELL + BORDER : (c + 1) * CELL + BORDER,
        ] = 0.0
    return cv2.resize(canvas, (IMG, IMG), interpolation=cv2.INTER_NEAREST)


# --------------------------------------------------------------------------
# Procedural audio -> cached MFCC planes
# --------------------------------------------------------------------------
AUDIO_SR = 16000
AUDIO_LEN = 1.0  # seconds


def _tone(freqs, decay=3.0, sr=AUDIO_SR, length=AUDIO_LEN) -> np.ndarray:
    t = np.arange(int(sr * length)) / sr
    sig = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate(freqs))
    return (sig * np.exp(-decay * t)).astype(np.float64)


@functools.lru_cache(maxsize=1)
def audio_waveforms() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(good, bad, noise) int16 waveforms standing in for the reference wavs."""
    good = _tone([523.25, 659.25, 783.99], decay=2.0)  # major-chord chime
    bad = np.sign(_tone([155.56], decay=1.0)) * np.exp(
        -1.5 * np.arange(int(AUDIO_SR * AUDIO_LEN)) / AUDIO_SR
    )  # low square-wave buzz
    noise = np.random.RandomState(42).randn(int(AUDIO_SR * AUDIO_LEN)) * 0.3
    to_i16 = lambda x: np.clip(x / (np.abs(x).max() + 1e-9) * 32000, -32768, 32767).astype(np.int16)  # noqa: E731
    return to_i16(good), to_i16(bad), to_i16(noise)


@functools.lru_cache(maxsize=1)
def audio_planes() -> np.ndarray:
    """(3, IMG, IMG) float32 cached MFCC planes: [good, bad, no_listen].

    Same wav->MFCC->bicubic-resize->minmax-[-1,1] pipeline as the reference
    (Minecraft.py:221-243), run once at import on host.
    """
    good, bad, noise = audio_waveforms()
    return np.stack(
        [
            mfcc_image(good, AUDIO_SR, IMG),
            mfcc_image(bad, AUDIO_SR, IMG),
            mfcc_image(noise, AUDIO_SR, IMG),
        ]
    ).astype(np.float32)
