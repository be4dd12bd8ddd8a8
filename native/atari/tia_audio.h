// TIA audio channels — the 2600 feature Skeleton+'s gameplay depends on.
//
// Each of the two channels (the STEREO pair on modified consoles, which is
// exactly the Skeleton+ configuration — SkelPlus.pro:6 "Stereo sound") has
// a 5-bit frequency divider (AUDF), a 4-bit waveform control (AUDC)
// selecting combinations of polynomial counters / fixed dividers, and a
// 4-bit volume (AUDV).  The audio clock is 2 ticks per scanline
// (~31.4 kHz NTSC; the reference samples the ALE stream at 30720 Hz,
// Config.py:87).
//
// Polynomial implementation follows the standard LFSR taps (4-bit: 3^2,
// 5-bit: 4^2, 9-bit: 8^4) used by open 2600 documentation.

#pragma once

#include <cstdint>

namespace mmtrl {

class TiaAudioChannel {
 public:
  uint8_t audc = 0;  // 4-bit control
  uint8_t audf = 0;  // 5-bit divider
  uint8_t audv = 0;  // 4-bit volume

  // Advance one audio clock (~31.4 kHz); returns the output sample 0..15.
  uint8_t clock() {
    if (++div_counter_ > audf) {
      div_counter_ = 0;
      tick_waveform();
    }
    return output_ ? (audv & 0x0F) : 0;
  }

 private:
  uint16_t poly4_ = 0x0F;
  uint16_t poly5_ = 0x1F;
  uint16_t poly9_ = 0x1FF;
  int div_counter_ = 0;
  int aux_counter_ = 0;
  bool output_ = true;

  bool step_poly4() {
    bool bit = poly4_ & 1;
    uint16_t fb = ((poly4_ >> 1) ^ poly4_) & 1;
    poly4_ = (poly4_ >> 1) | (fb << 3);
    return bit;
  }
  bool step_poly5() {
    bool bit = poly5_ & 1;
    uint16_t fb = ((poly5_ >> 2) ^ poly5_) & 1;
    poly5_ = (poly5_ >> 1) | (fb << 4);
    return bit;
  }
  bool step_poly9() {
    bool bit = poly9_ & 1;
    uint16_t fb = ((poly9_ >> 4) ^ poly9_) & 1;
    poly9_ = (poly9_ >> 1) | (fb << 8);
    return bit;
  }

  void tick_waveform() {
    switch (audc & 0x0F) {
      case 0x0:
      case 0xB:
        output_ = true;  // constant volume (set-to-1)
        break;
      case 0x1:
        output_ = step_poly4();
        break;
      case 0x2:  // 4-bit poly clocked every 15
        if (++aux_counter_ >= 15) {
          aux_counter_ = 0;
          output_ = step_poly4();
        }
        break;
      case 0x3:  // 5-bit poly gates 4-bit poly
        if (step_poly5()) output_ = step_poly4();
        break;
      case 0x4:
      case 0x5:
        output_ = !output_;  // divide by 2: pure tone
        break;
      case 0x6:
      case 0xA:  // divide by 31
        if (++aux_counter_ >= 31) {
          aux_counter_ = 0;
          output_ = !output_;
        }
        break;
      case 0x7:
      case 0x9:
        output_ = step_poly5();
        break;
      case 0x8:
        output_ = step_poly9();
        break;
      case 0xC:
      case 0xD:  // divide by 6: lower pure tone
        if (++aux_counter_ >= 3) {
          aux_counter_ = 0;
          output_ = !output_;
        }
        break;
      case 0xE:  // div 93
        if (++aux_counter_ >= 93) {
          aux_counter_ = 0;
          output_ = !output_;
        }
        break;
      case 0xF:  // 5-bit poly -> div 6
        if (step_poly5()) {
          if (++aux_counter_ >= 3) {
            aux_counter_ = 0;
            output_ = !output_;
          }
        }
        break;
    }
  }
};

// The stereo pair: channel 0 = left, channel 1 = right (Skeleton+'s
// footstep panning).
struct TiaAudio {
  TiaAudioChannel ch[2];

  // Write a TIA audio register (0x15-0x1A).
  void write(uint8_t reg, uint8_t value) {
    switch (reg) {
      case 0x15: ch[0].audc = value & 0x0F; break;
      case 0x16: ch[1].audc = value & 0x0F; break;
      case 0x17: ch[0].audf = value & 0x1F; break;
      case 0x18: ch[1].audf = value & 0x1F; break;
      case 0x19: ch[0].audv = value & 0x0F; break;
      case 0x1A: ch[1].audv = value & 0x0F; break;
      default: break;
    }
  }

  // One audio clock; fills left/right samples 0..15.
  void clock(uint8_t* left, uint8_t* right) {
    *left = ch[0].clock();
    *right = ch[1].clock();
  }
};

}  // namespace mmtrl
