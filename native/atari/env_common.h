// Shared scaffolding for per-game 2600 RL adapters (the ALE approach:
// one small RAM-semantics adapter per cartridge over a common machine).
// Used by skel_env.cc (the reference's SkelPlus.bin) and abi_env.cc
// (in-repo homebrew cartridges following the documented RL ABI).

#pragma once

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include "machine2600.h"

namespace mmtrl {
namespace envcommon {

constexpr int kFrameH = 192;
constexpr int kFrameW = 160;
constexpr int kSamplesPerFrame = 2 * 262;  // per channel

inline uint64_t splitmix64(uint64_t* state) {
  *state += 0x9E3779B97F4A7C15ull;
  uint64_t z = *state;
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4595Bull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

// Joystick/fire bit protocol shared by the adapters:
// bit0 up, bit1 down, bit2 left, bit3 right, bit4 fire.
inline void apply_input(Machine2600* m, uint8_t bits) {
  uint8_t swcha = 0xFF;
  if (bits & 0x01) swcha &= ~0x10;
  if (bits & 0x02) swcha &= ~0x20;
  if (bits & 0x04) swcha &= ~0x40;
  if (bits & 0x08) swcha &= ~0x80;
  m->riot().swcha = swcha;
  m->fire[0] = (bits & 0x10) != 0;
}

// Two-player variant: `bits0`/`bits1` use the same bit protocol, applied
// to the P0 (high) and P1 (low) SWCHA nibbles and the two fire lines.
inline void apply_input2(Machine2600* m, uint8_t bits0, uint8_t bits1) {
  uint8_t swcha = 0xFF;
  if (bits0 & 0x01) swcha &= ~0x10;
  if (bits0 & 0x02) swcha &= ~0x20;
  if (bits0 & 0x04) swcha &= ~0x40;
  if (bits0 & 0x08) swcha &= ~0x80;
  if (bits1 & 0x01) swcha &= ~0x01;
  if (bits1 & 0x02) swcha &= ~0x02;
  if (bits1 & 0x04) swcha &= ~0x04;
  if (bits1 & 0x08) swcha &= ~0x08;
  m->riot().swcha = swcha;
  m->fire[0] = (bits0 & 0x10) != 0;
  m->fire[1] = (bits1 & 0x10) != 0;
}

// Pixelwise max of the machine's last frame with `prev` into `out`
// (ALE flicker handling; a no-op difference for non-flickering games).
inline void copy_frame_max(Machine2600* m, const uint8_t* prev, uint8_t* out) {
  const auto& fr = m->video().frame();
  int h = (int)fr.size() < kFrameH ? (int)fr.size() : kFrameH;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < kFrameW; ++x) {
      uint8_t v = fr[y][x];
      out[y * kFrameW + x] =
          v > prev[y * kFrameW + x] ? v : prev[y * kFrameW + x];
    }
}

// Cold boot + stochastic start offset + GAME RESET console switch — the
// ALE reset_game() recipe.  Returns the fresh machine (caller owns).
inline Machine2600* boot_machine(const std::vector<uint8_t>& rom,
                                 uint64_t* rng) {
  auto* m = new Machine2600(rom.data(), rom.size());
  m->run_frames(2 + (int)(splitmix64(rng) % 29));
  m->riot().swchb = 0x0A;  // press GAME RESET
  m->run_frames(4);
  m->riot().swchb = 0x0B;
  m->run_frames(2);
  return m;
}

// Copy the env's unread stereo window ([cursor, cursor+want)) into
// `audio_out` (L then R), normalized to [0, 1], then drop consumed samples.
inline void drain_audio(Machine2600* m, size_t* cursor, int want,
                        float* audio_out) {
  const auto& l = m->audio_left();
  const auto& r = m->audio_right();
  size_t start = *cursor;
  for (int i = 0; i < want; ++i) {
    size_t idx = start + i;
    audio_out[i] = idx < l.size() ? l[idx] / 15.0f : 0.0f;
    audio_out[want + i] = idx < r.size() ? r[idx] / 15.0f : 0.0f;
  }
  m->consume_audio(l.size());
  *cursor = 0;
}

inline bool read_rom_file(const char* path, std::vector<uint8_t>* rom) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  int ch;
  while ((ch = std::fgetc(f)) != EOF) rom->push_back((uint8_t)ch);
  std::fclose(f);
  return !rom->empty() && (rom->size() & (rom->size() - 1)) == 0;
}

}  // namespace envcommon
}  // namespace mmtrl
