// Atari 2600 machine: 6507 memory map + frame timing + TIA video/audio.
//
// Maps the 13-bit bus to TIA / RIOT / cartridge, implements WSYNC
// (halt-to-scanline-boundary) and NTSC frame pacing, streams the TIA
// audio pair at 2 samples per scanline, renders playfield/sprites via the
// functional catch-up renderer (tia_video.h), and latches collision bits
// and the INPT4/5 fire buttons — enough to RUN, RENDER, and PLAY real
// 2K/4K ROMs (Skeleton+ included; see skel_env.cc for the RL adapter) plus
// 8K (F8) and 16K (F6) hotspot bank-switched cartridges.

#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

#include "m6502.h"
#include "riot.h"
#include "tia_audio.h"
#include "tia_video.h"

namespace mmtrl {

class Machine2600 {
 public:
  static constexpr int kCyclesPerScanline = 76;  // 228 color clocks / 3
  static constexpr int kScanlinesPerFrame = 262;

  explicit Machine2600(const uint8_t* rom, size_t size)
      : cpu_(Bus{[this](uint16_t a) { return bus_read(a); },
                 [this](uint16_t a, uint8_t v) { bus_write(a, v); }}) {
    rom_.assign(rom, rom + size);
    // 2K/4K images map flat; 8K/16K use the standard Atari hotspot
    // bank-switching schemes (F8: $1FF8/$1FF9; F6: $1FF6-$1FF9).  Power-up
    // selects the LAST bank — carts keep their vectors there.
    if (size == 8192) {
      scheme_ = Scheme::kF8;
      bank_ = 1;
    } else if (size == 16384) {
      scheme_ = Scheme::kF6;
      bank_ = 3;
    } else {
      scheme_ = Scheme::kFlat;
      rom_mask_ = size - 1;  // 2K/4K powers of two
    }
    cpu_.reset();
  }

  // Runs one scanline worth of CPU; returns false if the CPU hit an
  // obviously invalid state.  Audio is sampled twice per scanline.
  void run_scanline() {
    halted_ = false;
    int target = scanline_cycle_ + kCyclesPerScanline;
    while (scanline_cycle_ < target && !halted_) {
      int c = cpu_.step();
      scanline_cycle_ += c;
      riot_.tick(c);
    }
    if (halted_) riot_.tick(target - scanline_cycle_);
    video_.end_scanline();
    scanline_cycle_ = 0;
    ++scanline_;
    if (scanline_ >= kScanlinesPerFrame) {
      scanline_ = 0;
      ++frame_;
    }
    uint8_t l, r;
    audio_.clock(&l, &r);
    audio_left_.push_back(l);
    audio_right_.push_back(r);
    audio_.clock(&l, &r);
    audio_left_.push_back(l);
    audio_right_.push_back(r);
  }

  void run_frames(int n) {
    for (int i = 0; i < n * kScanlinesPerFrame; ++i) run_scanline();
  }

  M6502& cpu() { return cpu_; }
  Riot& riot() { return riot_; }
  TiaAudio& audio() { return audio_; }
  TiaVideo& video() { return video_; }
  uint64_t frame() const { return frame_; }
  const std::vector<uint8_t>& audio_left() const { return audio_left_; }
  const std::vector<uint8_t>& audio_right() const { return audio_right_; }

  // Drop the first n samples from both audio streams (consumers track a
  // cursor; without trimming the buffers grow without bound over training).
  void consume_audio(size_t n) {
    n = n > audio_left_.size() ? audio_left_.size() : n;
    audio_left_.erase(audio_left_.begin(), audio_left_.begin() + n);
    n = n > audio_right_.size() ? audio_right_.size() : n;
    audio_right_.erase(audio_right_.begin(), audio_right_.begin() + n);
  }
  int tia_writes = 0;
  int audio_reg_writes = 0;
  // INPT4/5: joystick fire buttons, active low (true = pressed).
  bool fire[2] = {false, false};

 private:
  // Hotspot bank switching triggers on ANY cartridge-space access (read,
  // write, even dummy cycles on real hardware — reads/writes suffice for
  // the supported schemes).
  void check_bankswitch(uint16_t addr) {
    uint16_t a = addr & 0xFFF;
    if (scheme_ == Scheme::kF8) {
      if (a == 0xFF8) bank_ = 0;
      else if (a == 0xFF9) bank_ = 1;
    } else if (scheme_ == Scheme::kF6) {
      if (a >= 0xFF6 && a <= 0xFF9) bank_ = a - 0xFF6;
    }
  }

  uint8_t bus_read(uint16_t addr) {
    addr &= 0x1FFF;  // 6507: 13 address lines
    if (addr & 0x1000) {
      check_bankswitch(addr);
      if (scheme_ == Scheme::kFlat) return rom_[addr & rom_mask_];
      return rom_[(size_t)bank_ * 0x1000 + (addr & 0xFFF)];
    }
    if ((addr & 0x0280) == 0x0080) return riot_.ram[addr & 0x7F];
    if ((addr & 0x0280) == 0x0280) {  // RIOT I/O + timer
      switch (addr & 0x07) {
        case 0x00: return riot_.swcha;
        case 0x01: return 0xFF;  // SWACNT
        case 0x02: return riot_.swchb;
        case 0x03: return 0xFF;  // SWBCNT
        case 0x04: case 0x06: return riot_.read_intim();
        case 0x05: case 0x07: return riot_.read_instat();
      }
      return 0xFF;
    }
    // TIA read space: collision latches + input ports.
    uint8_t reg = addr & 0x0F;
    if (reg <= 0x07) return video_.read_collision(reg);
    if (reg == 0x0C) return fire[0] ? 0x00 : 0x80;  // INPT4
    if (reg == 0x0D) return fire[1] ? 0x00 : 0x80;  // INPT5
    if (reg >= 0x08 && reg <= 0x0B) return 0x80;    // paddle pots: max
    return 0x00;
  }

  void bus_write(uint16_t addr, uint8_t value) {
    addr &= 0x1FFF;
    if (addr & 0x1000) {  // ROM: writes ignored, but hotspots still switch
      check_bankswitch(addr);
      return;
    }
    if ((addr & 0x0280) == 0x0080) {
      riot_.ram[addr & 0x7F] = value;
      return;
    }
    if ((addr & 0x0280) == 0x0280) {
      if ((addr & 0x1F) >= 0x14 && (addr & 0x1F) <= 0x17) {
        riot_.write_timer(addr & 0x03, value);
      }
      return;
    }
    // TIA
    ++tia_writes;
    uint8_t reg = addr & 0x3F;
    if (reg == 0x02) {  // WSYNC
      halted_ = true;
    } else if (reg >= 0x15 && reg <= 0x1A) {
      ++audio_reg_writes;
      audio_.write(reg, value);
    } else {
      video_.write(reg, value, scanline_cycle_ * 3);
    }
  }

  M6502 cpu_;
  Riot riot_;
  TiaAudio audio_;
  TiaVideo video_;
  std::vector<uint8_t> rom_;
  enum class Scheme { kFlat, kF8, kF6 };
  Scheme scheme_ = Scheme::kFlat;
  int bank_ = 0;
  size_t rom_mask_ = 0xFFF;
  bool halted_ = false;
  int scanline_cycle_ = 0;
  int scanline_ = 0;
  uint64_t frame_ = 0;
  std::vector<uint8_t> audio_left_, audio_right_;
};

}  // namespace mmtrl
