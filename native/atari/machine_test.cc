// Machine2600 tests with a synthetic hand-assembled cartridge (no external
// ROM needed): audio register programming, WSYNC pacing, RIOT timer polling.

#include "machine2600.h"

#include <cstdio>
#include <vector>

using mmtrl::Machine2600;

#define CHECK(cond)                                                          \
  do {                                                                        \
    if (!(cond)) {                                                            \
      std::fprintf(stderr, "FAILED %s:%d: %s\n", __FILE__, __LINE__, #cond);  \
      return 1;                                                               \
    }                                                                         \
  } while (0)

// Build a 4K image: program at $F000, reset vector -> $F000.
static std::vector<uint8_t> make_rom(std::initializer_list<uint8_t> prog) {
  std::vector<uint8_t> rom(4096, 0xEA);
  size_t i = 0;
  for (uint8_t b : prog) rom[i++] = b;
  rom[0xFFC & 0xFFF] = 0x00;  // reset vector lo -> $F000
  rom[0xFFD & 0xFFF] = 0xF0;
  return rom;
}

static int test_audio_program() {
  // LDA #$04; STA AUDC0($15)  (pure tone)
  // LDA #$05; STA AUDF0($17)
  // LDA #$0F; STA AUDV0($19)
  // loop: STA WSYNC($02); JMP loop
  auto rom = make_rom({
      0xA9, 0x04, 0x85, 0x15,
      0xA9, 0x05, 0x85, 0x17,
      0xA9, 0x0F, 0x85, 0x19,
      0x85, 0x02, 0x4C, 0x0C, 0xF0,
  });
  Machine2600 m(rom.data(), rom.size());
  m.run_frames(2);
  CHECK(m.audio_reg_writes == 3);
  CHECK(m.frame() == 2);
  const auto& l = m.audio_left();
  CHECK(l.size() == 2 * 2 * 262);
  int nonzero = 0;
  for (uint8_t s : l) nonzero += s != 0;
  // pure tone at full volume: roughly half the samples high
  CHECK(nonzero > (int)l.size() / 4 && nonzero < (int)l.size() * 3 / 4);
  return 0;
}

static int test_wsync_pacing() {
  // An infinite WSYNC loop must advance exactly one scanline per loop and
  // consume far fewer CPU cycles than free-running code would.
  auto rom = make_rom({0x85, 0x02, 0x4C, 0x00, 0xF0});
  Machine2600 m(rom.data(), rom.size());
  m.run_frames(1);
  CHECK(m.frame() == 1);
  // Each scanline: STA(3) + JMP(3) then halt -> ~6-9 cycles of 76.
  CHECK(m.cpu().total_cycles < 262 * 20);
  return 0;
}

static int test_riot_timer_poll() {
  // TIM64T = 2; poll INTIM until zero; then write $80 to RAM $80.
  auto rom = make_rom({
      0xA9, 0x02, 0x8D, 0x96, 0x02,        // LDA #2; STA TIM64T
      0xAD, 0x84, 0x02, 0xD0, 0xFB,        // poll: LDA INTIM; BNE poll
      0xA9, 0x80, 0x85, 0x80,              // LDA #$80; STA $80
      0x4C, 0x0E, 0xF0,                    // spin
  });
  Machine2600 m(rom.data(), rom.size());
  m.run_frames(1);
  CHECK(m.riot().ram[0] == 0x80);
  return 0;
}

static int test_playfield_render() {
  // Draw a solid playfield stripe: COLUPF=$0E, PF1=$FF, VBLANK off,
  // then WSYNC loop; VSYNC pulse at 'frame end' so a frame completes.
  auto rom = make_rom({
      0xA9, 0x0E, 0x85, 0x08,  // COLUPF = $0E
      0xA9, 0xFF, 0x85, 0x0E,  // PF1 = $FF
      0xA9, 0x00, 0x85, 0x01,  // VBLANK off
      // line loop: 100 scanlines of WSYNC
      0xA2, 0x64,              // LDX #100
      0x85, 0x02, 0xCA, 0xD0, 0xFB,  // l1: STA WSYNC; DEX; BNE l1
      // VSYNC pulse
      0xA9, 0x02, 0x85, 0x00, 0x85, 0x02, 0xA9, 0x00, 0x85, 0x00,
      0x4C, 0x0C, 0xF0,        // JMP back to LDX #100
  });
  Machine2600 m(rom.data(), rom.size());
  m.run_frames(3);
  const auto& fr = m.video().frame();
  CHECK(m.video().frames_completed >= 1);
  CHECK(fr.size() >= 90);
  // PF1 covers playfield dots 4-11 -> pixels 16..47 on the left half and
  // (repeated) 96..127 on the right half.
  const auto& line = fr[10];
  CHECK(line[20] == (0x0E >> 1));
  CHECK(line[100] == (0x0E >> 1));
  CHECK(line[0] == 0);   // background outside PF1
  CHECK(line[60] == 0);
  return 0;
}

static int test_player_sprite_and_collision() {
  // Position P0 via RESP0 after some delay, draw GRP0=$FF over a full
  // playfield -> P0-PF collision latches.
  auto rom = make_rom({
      0xA9, 0x0E, 0x85, 0x08,        // COLUPF
      0xA9, 0xFF, 0x85, 0x0D, 0x85, 0x0E, 0x85, 0x0F,  // PF0/1/2 = $FF
      0xA9, 0x00, 0x85, 0x01,        // VBLANK off
      0xA9, 0x44, 0x85, 0x06,        // COLUP0
      0xEA, 0xEA, 0xEA, 0x85, 0x10,  // delay; RESP0
      0xA9, 0xFF, 0x85, 0x1B,        // GRP0 = $FF
      0xA2, 0x64,                    // $F01D: LDX #100
      0x85, 0x02, 0xCA, 0xD0, 0xFB,  // 100 x WSYNC
      0xA9, 0x02, 0x85, 0x00, 0x85, 0x02, 0xA9, 0x00, 0x85, 0x00,
      0x4C, 0x1D, 0xF0,              // JMP $F01D (LDX, not mid-instruction)
  });
  Machine2600 m(rom.data(), rom.size());
  m.run_frames(3);
  // CXP0FB bit7 = P0-PF collision
  CHECK(m.video().read_collision(0x2) & 0x80);
  const auto& fr = m.video().frame();
  bool p0_seen = false;
  for (auto& line : fr)
    for (uint8_t px : line) p0_seen |= px == (0x44 >> 1);
  CHECK(p0_seen);
  return 0;
}

// Hotspot bank switching: an F8 (8K) image powers up in the LAST bank,
// reads its hotspot, and continues executing in the newly selected bank
// mid-stream (the classic cross-bank control transfer).
static int test_f8_bankswitch() {
  std::vector<uint8_t> rom(8192, 0xEA);
  // Bank 1 (power-up, image offset 0x1000) at $F000:
  //   LDA $FFF8   ; hotspot -> bank 0; next fetch ($F003) comes from bank 0
  rom[0x1000] = 0xAD; rom[0x1001] = 0xF8; rom[0x1002] = 0xFF;
  // Bank 0 at $F003: LDA #$42; STA $80; loop: STA WSYNC; JMP loop
  rom[0x0003] = 0xA9; rom[0x0004] = 0x42;
  rom[0x0005] = 0x85; rom[0x0006] = 0x80;
  rom[0x0007] = 0x85; rom[0x0008] = 0x02;
  rom[0x0009] = 0x4C; rom[0x000A] = 0x07; rom[0x000B] = 0xF0;
  // Reset vectors -> $F000 in both banks.
  rom[0x0FFC] = 0x00; rom[0x0FFD] = 0xF0;
  rom[0x1FFC] = 0x00; rom[0x1FFD] = 0xF0;
  Machine2600 m(rom.data(), rom.size());
  m.run_frames(1);
  CHECK(m.riot().ram[0] == 0x42);
  return 0;
}

// F6 (16K): four banks, hotspots $1FF6-$1FF9; power-up in bank 3.
static int test_f6_bankswitch() {
  std::vector<uint8_t> rom(16384, 0xEA);
  // Bank 3 (offset 0x3000) at $F000: LDA $FFF7 -> bank 1
  rom[0x3000] = 0xAD; rom[0x3001] = 0xF7; rom[0x3002] = 0xFF;
  // Bank 1 (offset 0x1000) at $F003: LDA #$77; STA $81; loop
  rom[0x1003] = 0xA9; rom[0x1004] = 0x77;
  rom[0x1005] = 0x85; rom[0x1006] = 0x81;
  rom[0x1007] = 0x85; rom[0x1008] = 0x02;
  rom[0x1009] = 0x4C; rom[0x100A] = 0x07; rom[0x100B] = 0xF0;
  for (int b = 0; b < 4; ++b) {
    rom[b * 0x1000 + 0xFFC] = 0x00;
    rom[b * 0x1000 + 0xFFD] = 0xF0;
  }
  Machine2600 m(rom.data(), rom.size());
  m.run_frames(1);
  CHECK(m.riot().ram[1] == 0x77);
  return 0;
}

int main() {
  int failures = 0;
  failures += test_f8_bankswitch();
  failures += test_f6_bankswitch();
  failures += test_playfield_render();
  failures += test_player_sprite_and_collision();
  failures += test_audio_program();
  failures += test_wsync_pacing();
  failures += test_riot_timer_poll();
  if (failures == 0) std::printf("machine2600: all tests passed\n");
  return failures;
}
