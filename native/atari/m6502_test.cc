// Unit tests for the 6502 core: flag semantics, addressing modes, stack
// discipline, decimal mode, and a machine-code fibonacci program.
//
// Build & run:  make -C native test-atari

#include "m6502.h"

#include <cassert>
#include <cstdio>
#include <cstring>
#include <vector>

using mmtrl::Bus;
using mmtrl::M6502;

struct Machine {
  std::vector<uint8_t> ram = std::vector<uint8_t>(65536, 0);
  M6502 cpu;

  Machine()
      : cpu(Bus{[this](uint16_t a) { return ram[a]; },
                [this](uint16_t a, uint8_t v) { ram[a] = v; }}) {}

  void load(uint16_t addr, std::initializer_list<uint8_t> bytes) {
    size_t i = 0;
    for (uint8_t b : bytes) ram[addr + i++] = b;
  }

  void boot(uint16_t entry) {
    ram[0xFFFC] = entry & 0xFF;
    ram[0xFFFD] = entry >> 8;
    cpu.reset();
  }

  void run(int max_steps) {
    for (int s = 0; s < max_steps; ++s) cpu.step();
  }
};

#define CHECK(cond)                                                      \
  do {                                                                    \
    if (!(cond)) {                                                        \
      std::fprintf(stderr, "FAILED %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      return 1;                                                           \
    }                                                                     \
  } while (0)

static int test_lda_flags() {
  Machine m;
  m.load(0x8000, {0xA9, 0x00, 0xA9, 0x80, 0xA9, 0x7F});
  m.boot(0x8000);
  m.cpu.step();
  CHECK(m.cpu.a == 0 && m.cpu.z && !m.cpu.n);
  m.cpu.step();
  CHECK(m.cpu.a == 0x80 && !m.cpu.z && m.cpu.n);
  m.cpu.step();
  CHECK(m.cpu.a == 0x7F && !m.cpu.z && !m.cpu.n);
  return 0;
}

static int test_adc_overflow_carry() {
  Machine m;
  // CLC; LDA #$50; ADC #$50  -> A=$A0, V=1, C=0, N=1
  m.load(0x8000, {0x18, 0xA9, 0x50, 0x69, 0x50});
  m.boot(0x8000);
  m.run(3);
  CHECK(m.cpu.a == 0xA0 && m.cpu.v && !m.cpu.c && m.cpu.n);
  // SEC; LDA #$FF; ADC #$01 -> A=$01, C=1, V=0
  m.load(0x8005, {0x38, 0xA9, 0xFF, 0x69, 0x01});
  m.run(3);
  CHECK(m.cpu.a == 0x01 && m.cpu.c && !m.cpu.v);
  return 0;
}

static int test_sbc() {
  Machine m;
  // SEC; LDA #$40; SBC #$20 -> A=$20, C=1 (no borrow)
  m.load(0x8000, {0x38, 0xA9, 0x40, 0xE9, 0x20});
  m.boot(0x8000);
  m.run(3);
  CHECK(m.cpu.a == 0x20 && m.cpu.c && !m.cpu.z && !m.cpu.n);
  // SEC; LDA #$20; SBC #$40 -> A=$E0, C=0 (borrow), N=1
  m.load(0x8005, {0x38, 0xA9, 0x20, 0xE9, 0x40});
  m.run(3);
  CHECK(m.cpu.a == 0xE0 && !m.cpu.c && m.cpu.n);
  return 0;
}

static int test_decimal_adc() {
  Machine m;
  // SED; CLC; LDA #$19; ADC #$01 -> A=$20 (BCD), C=0
  m.load(0x8000, {0xF8, 0x18, 0xA9, 0x19, 0x69, 0x01});
  m.boot(0x8000);
  m.run(4);
  CHECK(m.cpu.a == 0x20 && !m.cpu.c);
  // SED; CLC; LDA #$99; ADC #$01 -> A=$00, C=1
  m.load(0x8006, {0xF8, 0x18, 0xA9, 0x99, 0x69, 0x01});
  m.run(4);
  CHECK(m.cpu.a == 0x00 && m.cpu.c);
  return 0;
}

static int test_decimal_sbc() {
  Machine m;
  // SED; SEC; LDA #$20; SBC #$01 -> A=$19, C=1
  m.load(0x8000, {0xF8, 0x38, 0xA9, 0x20, 0xE9, 0x01});
  m.boot(0x8000);
  m.run(4);
  CHECK(m.cpu.a == 0x19 && m.cpu.c);
  return 0;
}

static int test_stack_jsr_rts() {
  Machine m;
  // JSR $8010; LDA #$55; BRK-ish stop ... subroutine: LDX #$42; RTS
  m.load(0x8000, {0x20, 0x10, 0x80, 0xA9, 0x55});
  m.load(0x8010, {0xA2, 0x42, 0x60});
  m.boot(0x8000);
  m.cpu.step();  // JSR
  CHECK(m.cpu.pc == 0x8010);
  m.cpu.step();  // LDX
  CHECK(m.cpu.x == 0x42);
  m.cpu.step();  // RTS
  CHECK(m.cpu.pc == 0x8003);
  m.cpu.step();  // LDA
  CHECK(m.cpu.a == 0x55);
  return 0;
}

static int test_indexed_addressing() {
  Machine m;
  m.ram[0x00F0] = 0x34;  // zp
  m.ram[0x00F5] = 0x78;  // zp,X with X=5
  m.ram[0x1234] = 0xAB;  // abs
  m.ram[0x1239] = 0xCD;  // abs,Y with Y=5
  // (zp,X): zp pointer at $20+X(=4)=$24 -> $4000
  m.ram[0x0024] = 0x00;
  m.ram[0x0025] = 0x40;
  m.ram[0x4000] = 0x5A;
  // (zp),Y: pointer at $30 -> $5000, +Y(5) = $5005
  m.ram[0x0030] = 0x00;
  m.ram[0x0031] = 0x50;
  m.ram[0x5005] = 0xA5;
  m.load(0x8000, {
      0xA5, 0xF0,              // LDA $F0
      0xA2, 0x05, 0xB5, 0xF0,  // LDX #5; LDA $F0,X
      0xAD, 0x34, 0x12,        // LDA $1234
      0xA0, 0x05, 0xB9, 0x34, 0x12,  // LDY #5; LDA $1234,Y
      0xA2, 0x04, 0xA1, 0x20,  // LDX #4; LDA ($20,X)
      0xB1, 0x30,              // LDA ($30),Y
  });
  m.boot(0x8000);
  m.cpu.step(); CHECK(m.cpu.a == 0x34);
  m.run(2); CHECK(m.cpu.a == 0x78);
  m.cpu.step(); CHECK(m.cpu.a == 0xAB);
  m.run(2); CHECK(m.cpu.a == 0xCD);
  m.run(2); CHECK(m.cpu.a == 0x5A);
  m.cpu.step(); CHECK(m.cpu.a == 0xA5);
  return 0;
}

static int test_fibonacci_program() {
  Machine m;
  // Compute fib(10) iteratively into $00 (a=fib(n), b at $01).
  // LDA #0; STA $00; LDA #1; STA $01; LDX #10
  // loop: LDA $00; CLC; ADC $01; LDY $01; STY $00; STA $01; DEX; BNE loop
  m.load(0x8000, {
      0xA9, 0x00, 0x85, 0x00,
      0xA9, 0x01, 0x85, 0x01,
      0xA2, 0x0A,
      // loop at $800A:
      0xA5, 0x00, 0x18, 0x65, 0x01,
      0xA4, 0x01, 0x84, 0x00, 0x85, 0x01,
      0xCA, 0xD0, 0xF2,  // BNE back to $800A (from pc=$8018: -14)
  });
  m.boot(0x8000);
  m.run(5 + 10 * 8);  // setup + 10 iterations of 8 instructions
  // fib: 0 1 1 2 3 5 8 13 21 34 55 89 -> after 10 iterations $01 = fib(11)=89
  CHECK(m.ram[0x01] == 89);
  CHECK(m.ram[0x00] == 55);
  return 0;
}

static int test_branch_and_cycles() {
  Machine m;
  // LDX #3; loop: DEX; BNE loop (taken twice, then fall through)
  m.load(0x8000, {0xA2, 0x03, 0xCA, 0xD0, 0xFD, 0xEA});
  m.boot(0x8000);
  uint64_t c0 = m.cpu.total_cycles;
  m.run(7);  // LDX, (DEX,BNE)x3 with last BNE not taken
  CHECK(m.cpu.x == 0);
  // cycles: 2 + 3*(2) + 2*(3) + 1*(2) = 16 (taken branch same page = 3)
  CHECK(m.cpu.total_cycles - c0 == 16);
  return 0;
}

static int test_interrupts() {
  Machine m;
  m.load(0x8000, {0xEA, 0xEA});
  m.load(0x9000, {0xA9, 0x77, 0x40});  // IRQ handler: LDA #$77; RTI
  m.ram[0xFFFE] = 0x00;
  m.ram[0xFFFF] = 0x90;
  m.boot(0x8000);
  m.cpu.step();
  m.cpu.i = false;
  uint16_t pc_before = m.cpu.pc;
  m.cpu.irq();
  CHECK(m.cpu.pc == 0x9000 && m.cpu.i);
  m.cpu.step();  // LDA #$77
  CHECK(m.cpu.a == 0x77);
  m.cpu.step();  // RTI
  CHECK(m.cpu.pc == pc_before);
  return 0;
}

int main() {
  int failures = 0;
  failures += test_lda_flags();
  failures += test_adc_overflow_carry();
  failures += test_sbc();
  failures += test_decimal_adc();
  failures += test_decimal_sbc();
  failures += test_stack_jsr_rts();
  failures += test_indexed_addressing();
  failures += test_fibonacci_program();
  failures += test_branch_and_cycles();
  failures += test_interrupts();
  if (failures == 0) std::printf("m6502: all tests passed\n");
  return failures;
}
