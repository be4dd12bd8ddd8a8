// Tests for the RIOT timer and TIA audio channels.

#include "riot.h"
#include "tia_audio.h"

#include <cstdio>
#include <set>
#include <vector>

using mmtrl::Riot;
using mmtrl::TiaAudio;
using mmtrl::TiaAudioChannel;

#define CHECK(cond)                                                          \
  do {                                                                        \
    if (!(cond)) {                                                            \
      std::fprintf(stderr, "FAILED %s:%d: %s\n", __FILE__, __LINE__, #cond);  \
      return 1;                                                               \
    }                                                                         \
  } while (0)

static int test_riot_timer() {
  Riot r;
  r.write_timer(2, 10);  // TIM64T: 10 * 64 cycles
  CHECK(r.read_intim() == 10);
  r.tick(64);
  CHECK(r.read_intim() == 9);
  r.tick(64 * 9);
  CHECK(r.read_intim() == 0);
  CHECK(r.read_instat() == 0x00);  // not yet underflowed
  r.tick(64);  // wraps to 0xFF and enters every-cycle counting
  r.tick(2);   // fast decrement before any INTIM read
  CHECK(r.read_instat() == 0xC0);  // underflow latched...
  CHECK(r.read_instat() == 0x00);  // ...and cleared by the read
  CHECK(r.read_intim() == 0xFD);   // 0xFF - 2; this read restores the rate
  r.tick(2);
  CHECK(r.read_intim() == 0xFD);   // divided rate again: unchanged after 2
  return 0;
}

static int test_riot_ram_ports() {
  Riot r;
  r.ram[0] = 0xAB;
  r.ram[127] = 0xCD;
  CHECK(r.ram[0] == 0xAB && r.ram[127] == 0xCD);
  CHECK(r.swcha == 0xFF);  // joysticks released (active low)
  return 0;
}

static int test_tia_pure_tone_period() {
  TiaAudioChannel ch;
  ch.audc = 0x4;  // divide-by-2 square wave
  ch.audf = 4;    // divider 5
  ch.audv = 15;
  // Output toggles every (audf+1) clocks -> full period 2*(audf+1) = 10.
  std::vector<uint8_t> samples;
  for (int i = 0; i < 40; ++i) samples.push_back(ch.clock());
  int transitions = 0;
  for (size_t i = 1; i < samples.size(); ++i)
    if (samples[i] != samples[i - 1]) ++transitions;
  CHECK(transitions == 7 || transitions == 8);  // ~40/5 toggles
  // Volume scaling
  for (uint8_t s : samples) CHECK(s == 0 || s == 15);
  return 0;
}

static int test_tia_noise_periods() {
  // 9-bit poly (AUDC=8) must not repeat within < 511 waveform ticks.
  TiaAudioChannel ch;
  ch.audc = 0x8;
  ch.audf = 0;
  ch.audv = 1;
  std::vector<uint8_t> first(511), second(511);
  for (int i = 0; i < 511; ++i) first[i] = ch.clock();
  for (int i = 0; i < 511; ++i) second[i] = ch.clock();
  CHECK(first == second);  // period exactly 511
  // and it actually looks like noise: both symbols appear many times
  int ones = 0;
  for (uint8_t s : first) ones += (s != 0);
  CHECK(ones > 150 && ones < 400);
  return 0;
}

static int test_tia_stereo_independent() {
  TiaAudio tia;
  tia.write(0x15, 0x4);  // ch0: tone
  tia.write(0x17, 2);
  tia.write(0x19, 8);
  tia.write(0x16, 0x8);  // ch1: noise
  tia.write(0x18, 0);
  tia.write(0x1A, 15);
  uint8_t l, r;
  std::set<uint8_t> lv, rv;
  for (int i = 0; i < 200; ++i) {
    tia.clock(&l, &r);
    lv.insert(l);
    rv.insert(r);
  }
  CHECK(lv == std::set<uint8_t>({0, 8}));
  CHECK(rv == std::set<uint8_t>({0, 15}));
  return 0;
}

static int test_tia_silence() {
  TiaAudioChannel ch;
  ch.audc = 0x0;
  ch.audv = 0;  // volume 0 -> silent regardless of control
  for (int i = 0; i < 50; ++i) CHECK(ch.clock() == 0);
  ch.audv = 9;  // constant mode outputs the volume
  bool any = false;
  for (int i = 0; i < 50; ++i) any |= ch.clock() == 9;
  CHECK(any);
  return 0;
}

int main() {
  int failures = 0;
  failures += test_riot_timer();
  failures += test_riot_ram_ports();
  failures += test_tia_pure_tone_period();
  failures += test_tia_noise_periods();
  failures += test_tia_stereo_independent();
  failures += test_tia_silence();
  if (failures == 0) std::printf("riot/tia-audio: all tests passed\n");
  return failures;
}
