// Mask-renderer equivalence fuzz: the lazily rebuilt object masks must
// match the per-pixel oracle predicates (pf_bit/player_bit/...) bit for
// bit under randomized register traffic through the real write() path.

#include <cstdio>
#include <cstdlib>
#include <random>

#include "tia_video.h"

using mmtrl::TiaVideo;

int main() {
  std::mt19937 rng(1234);
  TiaVideo tia;
  const uint8_t regs[] = {0x04, 0x05, 0x0A, 0x0B, 0x0C, 0x0D, 0x0E, 0x0F,
                          0x10, 0x11, 0x12, 0x13, 0x14, 0x1B, 0x1C, 0x1D,
                          0x1E, 0x1F, 0x20, 0x21, 0x22, 0x23, 0x24, 0x25,
                          0x26, 0x2A, 0x2B};
  int checks = 0;
  for (int trial = 0; trial < 4000; ++trial) {
    uint8_t reg = regs[rng() % (sizeof(regs))];
    uint8_t val = (uint8_t)(rng() & 0xFF);
    int cc = (int)(rng() % 228);
    tia.write(reg, val, cc);
    if (trial % 7 == 0) tia.end_scanline();
    if (trial % 13 != 0) continue;
    tia.rebuild_masks_for_test();
    for (int x = 0; x < TiaVideo::kVisible; ++x) {
      struct { bool m, o; const char* n; } c[] = {
          {tia.mask_pf(x), tia.oracle_pf(x), "pf"},
          {tia.mask_player(0, x), tia.oracle_player(0, x), "p0"},
          {tia.mask_player(1, x), tia.oracle_player(1, x), "p1"},
          {tia.mask_missile(0, x), tia.oracle_missile(0, x), "m0"},
          {tia.mask_missile(1, x), tia.oracle_missile(1, x), "m1"},
          {tia.mask_ball(x), tia.oracle_ball(x), "bl"},
      };
      for (auto& e : c) {
        if (e.m != e.o) {
          std::fprintf(stderr,
                       "MISMATCH trial=%d obj=%s x=%d mask=%d oracle=%d\n",
                       trial, e.n, x, e.m, e.o);
          return 1;
        }
        ++checks;
      }
    }
  }
  std::printf("tia-mask: all %d bit checks passed\n", checks);
  return 0;
}
