#include "m6502.h"

namespace mmtrl {

namespace {
inline bool page_crossed(uint16_t a, uint16_t b) { return (a & 0xFF00) != (b & 0xFF00); }
}  // namespace

uint8_t M6502::status(bool brk) const {
  return (n << 7) | (v << 6) | 0x20 | (brk ? 0x10 : 0) | (d << 3) | (i << 2) |
         (z << 1) | (c ? 1 : 0);
}

void M6502::set_status(uint8_t p) {
  n = p & 0x80;
  v = p & 0x40;
  d = p & 0x08;
  i = p & 0x04;
  z = p & 0x02;
  c = p & 0x01;
}

uint16_t M6502::read16(uint16_t addr) {
  return read(addr) | (read(addr + 1) << 8);
}

uint16_t M6502::read16_bug(uint16_t addr) {
  // NMOS indirect JMP wraps within the page for the high byte.
  uint16_t hi_addr = (addr & 0xFF00) | ((addr + 1) & 0x00FF);
  return read(addr) | (read(hi_addr) << 8);
}

void M6502::push(uint8_t v_) { write(0x0100 | sp--, v_); }
uint8_t M6502::pop() { return read(0x0100 | ++sp); }

void M6502::set_zn(uint8_t v_) {
  z = v_ == 0;
  n = v_ & 0x80;
}

void M6502::reset() {
  a = x = y = 0;
  sp = 0xFD;
  c = z = d = v = n = false;
  i = true;
  pc = read16(0xFFFC);
  total_cycles = 0;
}

void M6502::irq() {
  if (i) return;
  push(pc >> 8);
  push(pc & 0xFF);
  push(status(false));
  i = true;
  pc = read16(0xFFFE);
  total_cycles += 7;
}

void M6502::nmi() {
  push(pc >> 8);
  push(pc & 0xFF);
  push(status(false));
  i = true;
  pc = read16(0xFFFA);
  total_cycles += 7;
}

void M6502::adc(uint8_t m) {
  if (!d) {
    uint16_t sum = a + m + (c ? 1 : 0);
    v = (~(a ^ m) & (a ^ sum) & 0x80) != 0;
    c = sum > 0xFF;
    a = sum & 0xFF;
    set_zn(a);
  } else {
    // NMOS decimal mode: Z from the binary sum; N/V from the intermediate
    // high nibble; C from the decimal carry.
    uint16_t bin = a + m + (c ? 1 : 0);
    z = (bin & 0xFF) == 0;
    uint16_t lo = (a & 0x0F) + (m & 0x0F) + (c ? 1 : 0);
    uint16_t hi = (a >> 4) + (m >> 4);
    if (lo > 9) {
      lo += 6;
      hi += 1;
    }
    n = (hi & 0x08) != 0;
    v = (~(a ^ m) & (a ^ (hi << 4)) & 0x80) != 0;
    if (hi > 9) hi += 6;
    c = hi > 0x0F;
    a = ((hi & 0x0F) << 4) | (lo & 0x0F);
  }
}

void M6502::sbc(uint8_t m) {
  if (!d) {
    adc(~m);
  } else {
    // NMOS decimal SBC: flags from the binary operation, result corrected.
    uint16_t bin = a - m - (c ? 0 : 1);
    uint16_t lo = (a & 0x0F) - (m & 0x0F) - (c ? 0 : 1);
    uint16_t hi = (a >> 4) - (m >> 4);
    if (lo & 0x10) {
      lo -= 6;
      hi -= 1;
    }
    if (hi & 0x10) hi -= 6;
    v = ((a ^ m) & (a ^ bin) & 0x80) != 0;
    c = bin < 0x100;
    z = (bin & 0xFF) == 0;
    n = (bin & 0x80) != 0;
    a = ((hi & 0x0F) << 4) | (lo & 0x0F);
  }
}

void M6502::branch(bool cond, int8_t offset, int& cycles) {
  if (cond) {
    uint16_t target = pc + offset;
    cycles += page_crossed(pc, target) ? 2 : 1;
    pc = target;
  }
}

int M6502::step() {
  const uint8_t op = read(pc++);
  int cycles = 0;

  // Addressing-mode helpers (each returns the effective address; `extra`
  // marks the page-cross penalty for read instructions).
  bool extra = false;
  auto imm = [&]() { return pc++; };
  auto zp = [&]() { return (uint16_t)read(pc++); };
  auto zpx = [&]() { return (uint16_t)((read(pc++) + x) & 0xFF); };
  auto zpy = [&]() { return (uint16_t)((read(pc++) + y) & 0xFF); };
  auto abs_ = [&]() {
    uint16_t r = read16(pc);
    pc += 2;
    return r;
  };
  auto absx = [&]() {
    uint16_t base = read16(pc);
    pc += 2;
    extra = page_crossed(base, base + x);
    return (uint16_t)(base + x);
  };
  auto absy = [&]() {
    uint16_t base = read16(pc);
    pc += 2;
    extra = page_crossed(base, base + y);
    return (uint16_t)(base + y);
  };
  auto indx = [&]() {
    uint8_t zpa = read(pc++) + x;
    return (uint16_t)(read(zpa) | (read((uint8_t)(zpa + 1)) << 8));
  };
  auto indy = [&]() {
    uint8_t zpa = read(pc++);
    uint16_t base = read(zpa) | (read((uint8_t)(zpa + 1)) << 8);
    extra = page_crossed(base, base + y);
    return (uint16_t)(base + y);
  };

  auto cmp_ = [&](uint8_t reg, uint8_t m) {
    uint8_t r = reg - m;
    c = reg >= m;
    set_zn(r);
  };
  auto asl_m = [&](uint16_t addr) {
    uint8_t m = read(addr);
    c = m & 0x80;
    m <<= 1;
    write(addr, m);
    set_zn(m);
  };
  auto lsr_m = [&](uint16_t addr) {
    uint8_t m = read(addr);
    c = m & 1;
    m >>= 1;
    write(addr, m);
    set_zn(m);
  };
  auto rol_m = [&](uint16_t addr) {
    uint8_t m = read(addr);
    bool oc = c;
    c = m & 0x80;
    m = (m << 1) | (oc ? 1 : 0);
    write(addr, m);
    set_zn(m);
  };
  auto ror_m = [&](uint16_t addr) {
    uint8_t m = read(addr);
    bool oc = c;
    c = m & 1;
    m = (m >> 1) | (oc ? 0x80 : 0);
    write(addr, m);
    set_zn(m);
  };
  auto bit_ = [&](uint16_t addr) {
    uint8_t m = read(addr);
    z = (a & m) == 0;
    n = m & 0x80;
    v = m & 0x40;
  };

  switch (op) {
    // ---- loads -----------------------------------------------------------
    case 0xA9: a = read(imm()); set_zn(a); cycles = 2; break;
    case 0xA5: a = read(zp()); set_zn(a); cycles = 3; break;
    case 0xB5: a = read(zpx()); set_zn(a); cycles = 4; break;
    case 0xAD: a = read(abs_()); set_zn(a); cycles = 4; break;
    case 0xBD: a = read(absx()); set_zn(a); cycles = 4 + extra; break;
    case 0xB9: a = read(absy()); set_zn(a); cycles = 4 + extra; break;
    case 0xA1: a = read(indx()); set_zn(a); cycles = 6; break;
    case 0xB1: a = read(indy()); set_zn(a); cycles = 5 + extra; break;
    case 0xA2: x = read(imm()); set_zn(x); cycles = 2; break;
    case 0xA6: x = read(zp()); set_zn(x); cycles = 3; break;
    case 0xB6: x = read(zpy()); set_zn(x); cycles = 4; break;
    case 0xAE: x = read(abs_()); set_zn(x); cycles = 4; break;
    case 0xBE: x = read(absy()); set_zn(x); cycles = 4 + extra; break;
    case 0xA0: y = read(imm()); set_zn(y); cycles = 2; break;
    case 0xA4: y = read(zp()); set_zn(y); cycles = 3; break;
    case 0xB4: y = read(zpx()); set_zn(y); cycles = 4; break;
    case 0xAC: y = read(abs_()); set_zn(y); cycles = 4; break;
    case 0xBC: y = read(absx()); set_zn(y); cycles = 4 + extra; break;
    // ---- stores ----------------------------------------------------------
    case 0x85: write(zp(), a); cycles = 3; break;
    case 0x95: write(zpx(), a); cycles = 4; break;
    case 0x8D: write(abs_(), a); cycles = 4; break;
    case 0x9D: write(absx(), a); cycles = 5; break;
    case 0x99: write(absy(), a); cycles = 5; break;
    case 0x81: write(indx(), a); cycles = 6; break;
    case 0x91: write(indy(), a); cycles = 6; break;
    case 0x86: write(zp(), x); cycles = 3; break;
    case 0x96: write(zpy(), x); cycles = 4; break;
    case 0x8E: write(abs_(), x); cycles = 4; break;
    case 0x84: write(zp(), y); cycles = 3; break;
    case 0x94: write(zpx(), y); cycles = 4; break;
    case 0x8C: write(abs_(), y); cycles = 4; break;
    // ---- transfers -------------------------------------------------------
    case 0xAA: x = a; set_zn(x); cycles = 2; break;
    case 0xA8: y = a; set_zn(y); cycles = 2; break;
    case 0x8A: a = x; set_zn(a); cycles = 2; break;
    case 0x98: a = y; set_zn(a); cycles = 2; break;
    case 0xBA: x = sp; set_zn(x); cycles = 2; break;
    case 0x9A: sp = x; cycles = 2; break;
    // ---- stack -----------------------------------------------------------
    case 0x48: push(a); cycles = 3; break;
    case 0x08: push(status(true)); cycles = 3; break;
    case 0x68: a = pop(); set_zn(a); cycles = 4; break;
    case 0x28: set_status(pop()); cycles = 4; break;
    // ---- logic -----------------------------------------------------------
    case 0x29: a &= read(imm()); set_zn(a); cycles = 2; break;
    case 0x25: a &= read(zp()); set_zn(a); cycles = 3; break;
    case 0x35: a &= read(zpx()); set_zn(a); cycles = 4; break;
    case 0x2D: a &= read(abs_()); set_zn(a); cycles = 4; break;
    case 0x3D: a &= read(absx()); set_zn(a); cycles = 4 + extra; break;
    case 0x39: a &= read(absy()); set_zn(a); cycles = 4 + extra; break;
    case 0x21: a &= read(indx()); set_zn(a); cycles = 6; break;
    case 0x31: a &= read(indy()); set_zn(a); cycles = 5 + extra; break;
    case 0x49: a ^= read(imm()); set_zn(a); cycles = 2; break;
    case 0x45: a ^= read(zp()); set_zn(a); cycles = 3; break;
    case 0x55: a ^= read(zpx()); set_zn(a); cycles = 4; break;
    case 0x4D: a ^= read(abs_()); set_zn(a); cycles = 4; break;
    case 0x5D: a ^= read(absx()); set_zn(a); cycles = 4 + extra; break;
    case 0x59: a ^= read(absy()); set_zn(a); cycles = 4 + extra; break;
    case 0x41: a ^= read(indx()); set_zn(a); cycles = 6; break;
    case 0x51: a ^= read(indy()); set_zn(a); cycles = 5 + extra; break;
    case 0x09: a |= read(imm()); set_zn(a); cycles = 2; break;
    case 0x05: a |= read(zp()); set_zn(a); cycles = 3; break;
    case 0x15: a |= read(zpx()); set_zn(a); cycles = 4; break;
    case 0x0D: a |= read(abs_()); set_zn(a); cycles = 4; break;
    case 0x1D: a |= read(absx()); set_zn(a); cycles = 4 + extra; break;
    case 0x19: a |= read(absy()); set_zn(a); cycles = 4 + extra; break;
    case 0x01: a |= read(indx()); set_zn(a); cycles = 6; break;
    case 0x11: a |= read(indy()); set_zn(a); cycles = 5 + extra; break;
    case 0x24: bit_(zp()); cycles = 3; break;
    case 0x2C: bit_(abs_()); cycles = 4; break;
    // ---- arithmetic ------------------------------------------------------
    case 0x69: adc(read(imm())); cycles = 2; break;
    case 0x65: adc(read(zp())); cycles = 3; break;
    case 0x75: adc(read(zpx())); cycles = 4; break;
    case 0x6D: adc(read(abs_())); cycles = 4; break;
    case 0x7D: adc(read(absx())); cycles = 4 + extra; break;
    case 0x79: adc(read(absy())); cycles = 4 + extra; break;
    case 0x61: adc(read(indx())); cycles = 6; break;
    case 0x71: adc(read(indy())); cycles = 5 + extra; break;
    case 0xE9: sbc(read(imm())); cycles = 2; break;
    case 0xE5: sbc(read(zp())); cycles = 3; break;
    case 0xF5: sbc(read(zpx())); cycles = 4; break;
    case 0xED: sbc(read(abs_())); cycles = 4; break;
    case 0xFD: sbc(read(absx())); cycles = 4 + extra; break;
    case 0xF9: sbc(read(absy())); cycles = 4 + extra; break;
    case 0xE1: sbc(read(indx())); cycles = 6; break;
    case 0xF1: sbc(read(indy())); cycles = 5 + extra; break;
    case 0xC9: cmp_(a, read(imm())); cycles = 2; break;
    case 0xC5: cmp_(a, read(zp())); cycles = 3; break;
    case 0xD5: cmp_(a, read(zpx())); cycles = 4; break;
    case 0xCD: cmp_(a, read(abs_())); cycles = 4; break;
    case 0xDD: cmp_(a, read(absx())); cycles = 4 + extra; break;
    case 0xD9: cmp_(a, read(absy())); cycles = 4 + extra; break;
    case 0xC1: cmp_(a, read(indx())); cycles = 6; break;
    case 0xD1: cmp_(a, read(indy())); cycles = 5 + extra; break;
    case 0xE0: cmp_(x, read(imm())); cycles = 2; break;
    case 0xE4: cmp_(x, read(zp())); cycles = 3; break;
    case 0xEC: cmp_(x, read(abs_())); cycles = 4; break;
    case 0xC0: cmp_(y, read(imm())); cycles = 2; break;
    case 0xC4: cmp_(y, read(zp())); cycles = 3; break;
    case 0xCC: cmp_(y, read(abs_())); cycles = 4; break;
    // ---- inc/dec ---------------------------------------------------------
    case 0xE6: { uint16_t ad = zp(); uint8_t m = read(ad) + 1; write(ad, m); set_zn(m); cycles = 5; } break;
    case 0xF6: { uint16_t ad = zpx(); uint8_t m = read(ad) + 1; write(ad, m); set_zn(m); cycles = 6; } break;
    case 0xEE: { uint16_t ad = abs_(); uint8_t m = read(ad) + 1; write(ad, m); set_zn(m); cycles = 6; } break;
    case 0xFE: { uint16_t ad = absx(); uint8_t m = read(ad) + 1; write(ad, m); set_zn(m); cycles = 7; } break;
    case 0xC6: { uint16_t ad = zp(); uint8_t m = read(ad) - 1; write(ad, m); set_zn(m); cycles = 5; } break;
    case 0xD6: { uint16_t ad = zpx(); uint8_t m = read(ad) - 1; write(ad, m); set_zn(m); cycles = 6; } break;
    case 0xCE: { uint16_t ad = abs_(); uint8_t m = read(ad) - 1; write(ad, m); set_zn(m); cycles = 6; } break;
    case 0xDE: { uint16_t ad = absx(); uint8_t m = read(ad) - 1; write(ad, m); set_zn(m); cycles = 7; } break;
    case 0xE8: set_zn(++x); cycles = 2; break;
    case 0xC8: set_zn(++y); cycles = 2; break;
    case 0xCA: set_zn(--x); cycles = 2; break;
    case 0x88: set_zn(--y); cycles = 2; break;
    // ---- shifts ----------------------------------------------------------
    case 0x0A: c = a & 0x80; a <<= 1; set_zn(a); cycles = 2; break;
    case 0x06: asl_m(zp()); cycles = 5; break;
    case 0x16: asl_m(zpx()); cycles = 6; break;
    case 0x0E: asl_m(abs_()); cycles = 6; break;
    case 0x1E: asl_m(absx()); cycles = 7; break;
    case 0x4A: c = a & 1; a >>= 1; set_zn(a); cycles = 2; break;
    case 0x46: lsr_m(zp()); cycles = 5; break;
    case 0x56: lsr_m(zpx()); cycles = 6; break;
    case 0x4E: lsr_m(abs_()); cycles = 6; break;
    case 0x5E: lsr_m(absx()); cycles = 7; break;
    case 0x2A: { bool oc = c; c = a & 0x80; a = (a << 1) | (oc ? 1 : 0); set_zn(a); cycles = 2; } break;
    case 0x26: rol_m(zp()); cycles = 5; break;
    case 0x36: rol_m(zpx()); cycles = 6; break;
    case 0x2E: rol_m(abs_()); cycles = 6; break;
    case 0x3E: rol_m(absx()); cycles = 7; break;
    case 0x6A: { bool oc = c; c = a & 1; a = (a >> 1) | (oc ? 0x80 : 0); set_zn(a); cycles = 2; } break;
    case 0x66: ror_m(zp()); cycles = 5; break;
    case 0x76: ror_m(zpx()); cycles = 6; break;
    case 0x6E: ror_m(abs_()); cycles = 6; break;
    case 0x7E: ror_m(absx()); cycles = 7; break;
    // ---- jumps -----------------------------------------------------------
    case 0x4C: pc = read16(pc); cycles = 3; break;
    case 0x6C: pc = read16_bug(read16(pc)); cycles = 5; break;
    case 0x20: {
      uint16_t target = read16(pc);
      uint16_t ret = pc + 1;  // address of last byte of JSR operand
      push(ret >> 8);
      push(ret & 0xFF);
      pc = target;
      cycles = 6;
    } break;
    case 0x60: { uint16_t lo = pop(); pc = (lo | (pop() << 8)) + 1; cycles = 6; } break;
    case 0x40: set_status(pop()); { uint16_t lo = pop(); pc = lo | (pop() << 8); } cycles = 6; break;
    case 0x00: {  // BRK
      pc++;
      push(pc >> 8);
      push(pc & 0xFF);
      push(status(true));
      i = true;
      pc = read16(0xFFFE);
      cycles = 7;
    } break;
    // ---- branches --------------------------------------------------------
    case 0x90: { int8_t off = (int8_t)read(imm()); cycles = 2; branch(!c, off, cycles); } break;
    case 0xB0: { int8_t off = (int8_t)read(imm()); cycles = 2; branch(c, off, cycles); } break;
    case 0xF0: { int8_t off = (int8_t)read(imm()); cycles = 2; branch(z, off, cycles); } break;
    case 0x30: { int8_t off = (int8_t)read(imm()); cycles = 2; branch(n, off, cycles); } break;
    case 0xD0: { int8_t off = (int8_t)read(imm()); cycles = 2; branch(!z, off, cycles); } break;
    case 0x10: { int8_t off = (int8_t)read(imm()); cycles = 2; branch(!n, off, cycles); } break;
    case 0x50: { int8_t off = (int8_t)read(imm()); cycles = 2; branch(!v, off, cycles); } break;
    case 0x70: { int8_t off = (int8_t)read(imm()); cycles = 2; branch(v, off, cycles); } break;
    // ---- flags -----------------------------------------------------------
    case 0x18: c = false; cycles = 2; break;
    case 0xD8: d = false; cycles = 2; break;
    case 0x58: i = false; cycles = 2; break;
    case 0xB8: v = false; cycles = 2; break;
    case 0x38: c = true; cycles = 2; break;
    case 0xF8: d = true; cycles = 2; break;
    case 0x78: i = true; cycles = 2; break;
    case 0xEA: cycles = 2; break;  // NOP
    default:
      // Unofficial opcodes: treated as 2-cycle NOPs for now (SkelPlus uses
      // official opcodes; full undocumented-opcode support lands with the
      // TIA work).
      cycles = 2;
      break;
  }
  total_cycles += cycles;
  return cycles;
}

}  // namespace mmtrl
