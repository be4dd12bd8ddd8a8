// MOS 6532 RIOT (RAM-I/O-Timer) — the 2600's second chip.
//
// 128 bytes RAM, two 8-bit I/O ports (SWCHA: joysticks, SWCHB: console
// switches), and the interval timer with 1/8/64/1024-cycle prescales —
// everything Skeleton+ polls for input and frame timing.

#pragma once

#include <cstdint>

namespace mmtrl {

class Riot {
 public:
  uint8_t ram[128] = {0};

  // Port inputs (active-low joystick lines, console switches).
  uint8_t swcha = 0xFF;  // P0/P1 joysticks
  uint8_t swchb = 0x0B;  // select/reset released, color, P0/P1 amateur

  void write_timer(uint8_t reg, uint8_t value) {
    // TIM1T/TIM8T/TIM64T/T1024T at 0x294-0x297
    static const int kPrescale[4] = {1, 8, 64, 1024};
    prescale_ = kPrescale[reg & 3];
    timer_ = value;
    sub_cycles_ = 0;
    flag_ = false;
    fast_ = false;
  }

  // Reading INTIM resumes the divided rate after an underflow (6532
  // behavior); the INSTAT flag is cleared only by reading INSTAT.
  uint8_t read_intim() {
    fast_ = false;
    return timer_;
  }

  uint8_t read_instat() {
    uint8_t v = flag_ ? 0xC0 : 0x00;
    flag_ = false;
    return v;
  }

  void tick(int cycles) {
    while (cycles-- > 0) {
      if (++sub_cycles_ >= (fast_ ? 1 : prescale_)) {
        sub_cycles_ = 0;
        if (timer_ == 0) {
          flag_ = true;
          fast_ = true;  // count every cycle until INTIM is read
          timer_ = 0xFF;
        } else {
          --timer_;
        }
      }
    }
  }

 private:
  uint8_t timer_ = 0;
  int prescale_ = 1024;
  int sub_cycles_ = 0;
  bool flag_ = false;
  bool fast_ = false;
};

}  // namespace mmtrl
