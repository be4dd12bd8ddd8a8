// ROM execution harness: load a 2600 cartridge image, run N frames, report
// execution/audio statistics.  Used to validate the 6507/RIOT/TIA-audio
// stack against real cartridge code (e.g. the reference's SkelPlus.bin —
// pass its path; the binary itself is not vendored into this repo).
//
//   build/run_rom <rom.bin> [frames]

#include "machine2600.h"

#include <cstdio>
#include <cstdlib>
#include <vector>

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <rom.bin> [frames]\n", argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", argv[1]);
    return 2;
  }
  std::vector<uint8_t> rom;
  int ch;
  while ((ch = std::fgetc(f)) != EOF) rom.push_back((uint8_t)ch);
  std::fclose(f);
  int frames = argc > 2 ? std::atoi(argv[2]) : 60;

  mmtrl::Machine2600 m(rom.data(), rom.size());
  std::printf("rom: %zu bytes, reset vector: $%04X\n", rom.size(), m.cpu().pc);
  m.run_frames(frames);

  const auto& l = m.audio_left();
  const auto& r = m.audio_right();
  long lsum = 0, rsum = 0;
  int lnz = 0, rnz = 0;
  for (uint8_t v : l) { lsum += v; lnz += v != 0; }
  for (uint8_t v : r) { rsum += v; rnz += v != 0; }
  std::printf(
      "frames=%llu instructions~cycles=%llu tia_writes=%d audio_reg_writes=%d\n",
      (unsigned long long)m.frame(), (unsigned long long)m.cpu().total_cycles,
      m.tia_writes, m.audio_reg_writes);
  std::printf(
      "audio: %zu samples/ch, left nonzero=%d mean=%.2f, right nonzero=%d mean=%.2f\n",
      l.size(), lnz, l.empty() ? 0.0 : (double)lsum / l.size(), rnz,
      r.empty() ? 0.0 : (double)rsum / r.size());

  if (argc > 3 && std::atoi(argv[3]) != 0) {
    // ASCII dump of the last completed frame (every 2nd row/col) + zero page.
    const auto& fr = m.video().frame();
    std::printf("frame height: %zu lines\n", fr.size());
    for (size_t y = 0; y < fr.size(); y += 3) {
      for (int x = 0; x < 160; x += 2) {
        uint8_t v = fr[y][x];
        std::putchar(v == 0 ? '.' : (v < 32 ? '+' : '#'));
      }
      std::printf("  %3zu\n", y);
    }
    std::printf("zero page ($80-$8F):");
    for (int i = 0; i < 16; ++i) std::printf(" %02X", m.riot().ram[i]);
    std::printf("\n");
  }
  return 0;
}
