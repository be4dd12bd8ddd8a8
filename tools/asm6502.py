"""Minimal two-pass 6502 assembler for in-repo homebrew 2600 cartridges.

The reference ships exactly one cartridge (environments/skeleton_plus/
SkelPlus.bin) and no tooling to make more; our native 2600 core
(native/atari) is game-general, and this assembler is what lets the repo
PROVE that with a second, from-scratch cartridge (native/homebrew/rally.asm)
rather than a claim.  It is deliberately small: the documented-opcode
subset real kernels use, two passes, labels, constants, `.org/.byte/.word`,
`<`/`>` lo/hi operators and `+`/`-` arithmetic.

Syntax (one statement per line, `;` comments):

    SCORE = $80            ; constant
    .org  $F000            ; set location counter
  start:                   ; label
    lda #<start            ; immediate with lo-byte operator
    sta SCORE+1            ; zero-page (chosen when the operand fits)
    bne start              ; relative branch
    .word start            ; little-endian 16-bit data (vectors)

Zero-page vs absolute is decided in pass 1: operands that resolve below
$100 at first sight use zero-page encodings (define register constants
before use); unresolved forward references assemble as absolute.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# opcode table: (mnemonic, mode) -> opcode byte
# modes: imp acc imm zp zpx zpy abs abx aby ind inx iny rel
# ---------------------------------------------------------------------------
OPCODES: Dict[Tuple[str, str], int] = {}


def _op(mn: str, **modes: int) -> None:
    for mode, byte in modes.items():
        OPCODES[(mn, mode)] = byte


_op("adc", imm=0x69, zp=0x65, zpx=0x75, abs=0x6D, abx=0x7D, aby=0x79,
    inx=0x61, iny=0x71)
_op("and", imm=0x29, zp=0x25, zpx=0x35, abs=0x2D, abx=0x3D, aby=0x39,
    inx=0x21, iny=0x31)
_op("asl", acc=0x0A, zp=0x06, zpx=0x16, abs=0x0E, abx=0x1E)
_op("bit", zp=0x24, abs=0x2C)
_op("brk", imp=0x00)
_op("clc", imp=0x18)
_op("cld", imp=0xD8)
_op("cli", imp=0x58)
_op("clv", imp=0xB8)
_op("cmp", imm=0xC9, zp=0xC5, zpx=0xD5, abs=0xCD, abx=0xDD, aby=0xD9,
    inx=0xC1, iny=0xD1)
_op("cpx", imm=0xE0, zp=0xE4, abs=0xEC)
_op("cpy", imm=0xC0, zp=0xC4, abs=0xCC)
_op("dec", zp=0xC6, zpx=0xD6, abs=0xCE, abx=0xDE)
_op("dex", imp=0xCA)
_op("dey", imp=0x88)
_op("eor", imm=0x49, zp=0x45, zpx=0x55, abs=0x4D, abx=0x5D, aby=0x59,
    inx=0x41, iny=0x51)
_op("inc", zp=0xE6, zpx=0xF6, abs=0xEE, abx=0xFE)
_op("inx", imp=0xE8)
_op("iny", imp=0xC8)
_op("jmp", abs=0x4C, ind=0x6C)
_op("jsr", abs=0x20)
_op("lda", imm=0xA9, zp=0xA5, zpx=0xB5, abs=0xAD, abx=0xBD, aby=0xB9,
    inx=0xA1, iny=0xB1)
_op("ldx", imm=0xA2, zp=0xA6, zpy=0xB6, abs=0xAE, aby=0xBE)
_op("ldy", imm=0xA0, zp=0xA4, zpx=0xB4, abs=0xAC, abx=0xBC)
_op("lsr", acc=0x4A, zp=0x46, zpx=0x56, abs=0x4E, abx=0x5E)
_op("nop", imp=0xEA)
_op("ora", imm=0x09, zp=0x05, zpx=0x15, abs=0x0D, abx=0x1D, aby=0x19,
    inx=0x01, iny=0x11)
_op("pha", imp=0x48)
_op("php", imp=0x08)
_op("pla", imp=0x68)
_op("plp", imp=0x28)
_op("rol", acc=0x2A, zp=0x26, zpx=0x36, abs=0x2E, abx=0x3E)
_op("ror", acc=0x6A, zp=0x66, zpx=0x76, abs=0x6E, abx=0x7E)
_op("rti", imp=0x40)
_op("rts", imp=0x60)
_op("sbc", imm=0xE9, zp=0xE5, zpx=0xF5, abs=0xED, abx=0xFD, aby=0xF9,
    inx=0xE1, iny=0xF1)
_op("sec", imp=0x38)
_op("sed", imp=0xF8)
_op("sei", imp=0x78)
_op("sta", zp=0x85, zpx=0x95, abs=0x8D, abx=0x9D, aby=0x99, inx=0x81,
    iny=0x91)
_op("stx", zp=0x86, zpy=0x96, abs=0x8E)
_op("sty", zp=0x84, zpx=0x94, abs=0x8C)
_op("tax", imp=0xAA)
_op("tay", imp=0xA8)
_op("tsx", imp=0xBA)
_op("txa", imp=0x8A)
_op("txs", imp=0x9A)
_op("tya", imp=0x98)

BRANCHES = {"bcc": 0x90, "bcs": 0xB0, "beq": 0xF0, "bmi": 0x30,
            "bne": 0xD0, "bpl": 0x10, "bvc": 0x50, "bvs": 0x70}

_NUM = re.compile(r"^(\$[0-9a-fA-F]+|%[01]+|[0-9]+)$")
_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class AsmError(Exception):
    pass


def _parse_num(tok: str) -> int:
    if tok.startswith("$"):
        return int(tok[1:], 16)
    if tok.startswith("%"):
        return int(tok[1:], 2)
    return int(tok, 10)


class Assembler:
    def __init__(self) -> None:
        self.symbols: Dict[str, int] = {}
        self.origin: Optional[int] = None
        # Pass-1 zp/abs decisions keyed by statement index so pass 2 emits
        # identical sizes even after forward symbols resolve small.
        self._mode_memo: Dict[int, str] = {}

    # -- expression evaluation ------------------------------------------------
    def _eval(self, expr: str, must: bool) -> Optional[int]:
        expr = expr.strip()
        if not expr:
            raise AsmError("empty expression")
        if expr[0] in "<>":
            inner = self._eval(expr[1:], must)
            if inner is None:
                return None
            return inner & 0xFF if expr[0] == "<" else (inner >> 8) & 0xFF
        # left-to-right +/- chain
        parts = re.split(r"([+\-])", expr)
        total, sign = 0, 1
        for part in parts:
            part = part.strip()
            if part == "+":
                sign = 1
            elif part == "-":
                sign = -1
            elif part == "*":
                total += sign * self._pc()
            elif _NUM.match(part):
                total += sign * _parse_num(part)
            elif _NAME.match(part):
                if part not in self.symbols:
                    if must:
                        raise AsmError(f"undefined symbol {part!r}")
                    return None
                total += sign * self.symbols[part]
            else:
                raise AsmError(f"bad expression token {part!r}")
        return total & 0xFFFF

    def _pc(self) -> int:
        return self.pc

    # -- operand classification -------------------------------------------
    def _operand(self, idx: int, mn: str, op: str, final: bool
                 ) -> Tuple[str, Optional[int]]:
        """Returns (mode, value).  value None only when not final."""
        op = op.strip()
        if not op:
            return "imp", None
        if op.upper() == "A":
            return "acc", None
        if mn in BRANCHES:
            return "rel", self._eval(op, final)
        if op.startswith("#"):
            return "imm", self._eval(op[1:], final)
        m = re.match(r"^\((.*)\)\s*,\s*[yY]$", op)
        if m:
            return "iny", self._eval(m.group(1), final)
        m = re.match(r"^\((.*),\s*[xX]\)$", op)
        if m:
            return "inx", self._eval(m.group(1), final)
        m = re.match(r"^\((.*)\)$", op)
        if m:
            return "ind", self._eval(m.group(1), final)
        idx_reg = ""
        m = re.match(r"^(.*),\s*([xXyY])$", op)
        if m:
            op, idx_reg = m.group(1), m.group(2).lower()
        val = self._eval(op, final)
        # zp vs abs: decide once, in pass 1; JMP/JSR are always abs.
        if idx in self._mode_memo:
            base = self._mode_memo[idx]
        else:
            small = val is not None and val < 0x100 and mn not in ("jmp", "jsr")
            base = "zp" if small else "abs"
            self._mode_memo[idx] = base
        if idx_reg == "x":
            return ("zpx" if base == "zp" else "abx"), val
        if idx_reg == "y":
            # ldx $nn,Y / stx $nn,Y are zpy; others absolute-Y
            if base == "zp" and (mn, "zpy") in OPCODES:
                return "zpy", val
            return "aby", val
        return base, val

    # -- statement assembly -------------------------------------------------
    def _emit(self, idx: int, mn: str, op: str, final: bool) -> bytes:
        mode, val = self._operand(idx, mn, op, final)
        if mn in BRANCHES:
            if not final:
                return b"\x00\x00"
            assert val is not None
            delta = val - (self.pc + 2)
            if not -128 <= delta <= 127:
                raise AsmError(f"branch out of range: {mn} {op} ({delta})")
            return bytes([BRANCHES[mn], delta & 0xFF])
        key = (mn, mode)
        if key not in OPCODES:
            raise AsmError(f"unsupported combination {mn} / {mode}")
        byte = OPCODES[key]
        if mode in ("imp", "acc"):
            return bytes([byte])
        if mode in ("imm", "zp", "zpx", "zpy", "inx", "iny"):
            if not final:
                return bytes([byte, 0])
            assert val is not None
            if val > 0xFF:
                raise AsmError(f"operand {val:#x} too large for {mn} {mode}")
            return bytes([byte, val & 0xFF])
        if not final:
            return bytes([byte, 0, 0])
        assert val is not None
        return bytes([byte, val & 0xFF, (val >> 8) & 0xFF])

    # -- the two passes -----------------------------------------------------
    def assemble(self, source: str) -> Tuple[int, bytes]:
        """Returns (origin, image bytes)."""
        lines = source.splitlines()
        for final in (False, True):
            self.pc = 0
            self.origin = None
            out = bytearray()
            idx = 0
            for lineno, raw in enumerate(lines, 1):
                line = raw.split(";", 1)[0].rstrip()
                if not line.strip():
                    continue
                try:
                    # label(s)
                    m = re.match(r"^\s*([A-Za-z_][A-Za-z0-9_]*):(.*)$", line)
                    if m:
                        self.symbols[m.group(1)] = self.pc
                        line = m.group(2)
                        if not line.strip():
                            continue
                    stripped = line.strip()
                    # constant definition
                    m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$",
                                 stripped)
                    if m:
                        v = self._eval(m.group(2), final)
                        if v is not None:
                            self.symbols[m.group(1)] = v
                        continue
                    # directives
                    if stripped.lower().startswith(".org"):
                        v = self._eval(stripped[4:], True)
                        assert v is not None
                        if self.origin is None:
                            self.origin = v
                        elif v < self.pc:
                            raise AsmError(".org going backwards")
                        else:
                            out.extend(b"\x00" * (v - self.pc))
                        self.pc = v
                        continue
                    if stripped.lower().startswith(".byte"):
                        for tok in stripped[5:].split(","):
                            v = self._eval(tok, final)
                            out.append((v or 0) & 0xFF)
                            self.pc += 1
                        idx += 1
                        continue
                    if stripped.lower().startswith(".word"):
                        for tok in stripped[5:].split(","):
                            v = self._eval(tok, final) or 0
                            out.extend([v & 0xFF, (v >> 8) & 0xFF])
                            self.pc += 2
                        idx += 1
                        continue
                    # instruction
                    parts = stripped.split(None, 1)
                    mn = parts[0].lower()
                    op = parts[1] if len(parts) > 1 else ""
                    if mn not in BRANCHES and (mn, "imp") not in OPCODES \
                            and not any(k[0] == mn for k in OPCODES):
                        raise AsmError(f"unknown mnemonic {mn!r}")
                    code = self._emit(idx, mn, op, final)
                    out.extend(code)
                    self.pc += len(code)
                    idx += 1
                except AsmError as e:
                    raise AsmError(f"line {lineno}: {e}") from None
        if self.origin is None:
            raise AsmError("no .org directive")
        return self.origin, bytes(out)


def assemble(source: str) -> Tuple[int, bytes]:
    return Assembler().assemble(source)


def assemble_cartridge(source: str, size: int = 4096) -> bytes:
    """Assemble and pad to a power-of-two cartridge image.

    The image is padded with zeros up to `size`; the source must place the
    6502 reset/IRQ vectors at the top via `.org $Fxxx` + `.word`.
    """
    origin, image = assemble(source)
    if len(image) > size:
        raise AsmError(f"program {len(image)}B exceeds cartridge {size}B")
    end = origin + size - 1
    if (origin & (size - 1)) != 0:
        raise AsmError(f".org {origin:#x} not aligned to cartridge size")
    del end
    return image + b"\x00" * (size - len(image))


if __name__ == "__main__":
    import sys

    src_path, out_path = sys.argv[1], sys.argv[2]
    with open(src_path) as f:
        rom = assemble_cartridge(f.read())
    with open(out_path, "wb") as f:
        f.write(rom)
    print(f"{out_path}: {len(rom)} bytes")
