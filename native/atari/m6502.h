// MOS 6502 CPU core — groundwork for the native Skeleton+ / ALE path.
//
// The reference's Skeleton+ benchmark runs on an Atari 2600 ROM
// (environments/skeleton_plus/SkelPlus.bin) through the C++ ALE.  The 2600
// is a 6507 (a 6502 with a 13-bit address bus) + TIA + RIOT; this is the
// CPU core with all official opcodes, cycle counts, and NMOS flag
// semantics (including decimal-mode ADC/SBC).  The bus is abstracted so
// the same core drives the planned 2600 machine (TIA/RIOT mapping) or unit
// tests against plain RAM.

#pragma once

#include <cstdint>
#include <functional>

namespace mmtrl {

struct Bus {
  // 64 KiB address space; the machine maps mirrors/registers behind this.
  std::function<uint8_t(uint16_t)> read;
  std::function<void(uint16_t, uint8_t)> write;
};

class M6502 {
 public:
  explicit M6502(Bus bus) : bus_(std::move(bus)) {}

  void reset();
  // Executes one instruction; returns cycles consumed.
  int step();

  // Architectural state (public for tests/snapshots).
  uint8_t a = 0, x = 0, y = 0, sp = 0xFD;
  uint16_t pc = 0;
  // Flags
  bool c = false, z = false, i = true, d = false, v = false, n = false;

  uint64_t total_cycles = 0;

  uint8_t status(bool brk) const;
  void set_status(uint8_t p);

  void irq();
  void nmi();

 private:
  Bus bus_;

  uint8_t read(uint16_t addr) { return bus_.read(addr); }
  void write(uint16_t addr, uint8_t v_) { bus_.write(addr, v_); }
  uint16_t read16(uint16_t addr);
  uint16_t read16_bug(uint16_t addr);  // JMP ($xxFF) page-wrap bug

  void push(uint8_t v_);
  uint8_t pop();

  void set_zn(uint8_t v_);
  void adc(uint8_t m);
  void sbc(uint8_t m);
  void branch(bool cond, int8_t offset, int& cycles);
};

}  // namespace mmtrl
