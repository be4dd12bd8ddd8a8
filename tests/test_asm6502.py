"""Assembler sanity: byte-exact against hand-assembled sequences.

The expected byte strings below are the same hand-assembled encodings the
6502 core's C++ tests use (native/atari/m6502_test.cc), so the assembler
and the emulator agree on the instruction encodings by construction.
"""

import pytest

from tools.asm6502 import AsmError, assemble, assemble_cartridge


def body(src: str) -> bytes:
    _, image = assemble(".org $F000\n" + src)
    return image


def test_immediate_loads():
    # LDA #$00 / LDA #$80 / LDA #$7F (m6502_test.cc:50)
    assert body("lda #$00\nlda #$80\nlda #$7F") == bytes(
        [0xA9, 0x00, 0xA9, 0x80, 0xA9, 0x7F]
    )


def test_adc_sbc_sequences():
    # CLC; LDA #$50; ADC #$50 (m6502_test.cc:64)
    assert body("clc\nlda #$50\nadc #$50") == bytes(
        [0x18, 0xA9, 0x50, 0x69, 0x50]
    )
    # SEC; LDA #$40; SBC #$20 (m6502_test.cc:78)
    assert body("sec\nlda #$40\nsbc #$20") == bytes(
        [0x38, 0xA9, 0x40, 0xE9, 0x20]
    )


def test_zero_page_vs_absolute():
    src = """
COLUBK = $09
BIGADDR = $0284
    lda COLUBK      ; zp
    sta BIGADDR     ; abs
    lda COLUBK,X    ; zp,X
    sta BIGADDR,X   ; abs,X
"""
    assert body(src) == bytes(
        [0xA5, 0x09, 0x8D, 0x84, 0x02, 0xB5, 0x09, 0x9D, 0x84, 0x02]
    )


def test_branches_forward_and_back():
    src = """
top:
    dex
    bne top       ; -3
    beq ahead     ; +1 (skips the nop)
    nop
ahead:
    rts
"""
    assert body(src) == bytes([0xCA, 0xD0, 0xFD, 0xF0, 0x01, 0xEA, 0x60])


def test_branch_out_of_range():
    far = "\n".join(["nop"] * 200)
    with pytest.raises(AsmError, match="out of range"):
        body(f"top:\n{far}\nbne top")


def test_labels_and_vectors():
    src = """
    .org $F000
start:
    sei
    cld
    jmp start
    .org $FFFC
    .word start, start
"""
    _, image = assemble(src)
    assert image[:5] == bytes([0x78, 0xD8, 0x4C, 0x00, 0xF0])
    assert image[0xFFC:] == bytes([0x00, 0xF0, 0x00, 0xF0])
    assert len(image) == 0x1000


def test_lo_hi_operators_and_arith():
    src = """
    .org $F000
target:
    lda #<target
    ldx #>target
    sta $80+2
"""
    assert assemble(src)[1] == bytes([0xA9, 0x00, 0xA2, 0xF0, 0x85, 0x82])


def test_indexed_indirect_modes():
    assert body("lda ($80),Y\nsta ($10,X)") == bytes([0xB1, 0x80, 0x81, 0x10])


def test_accumulator_and_shifts():
    assert body("asl A\nlsr A\nasl $81\nror $82") == bytes(
        [0x0A, 0x4A, 0x06, 0x81, 0x66, 0x82]
    )


def test_forward_reference_is_absolute():
    # A forward symbol can't be proven zero-page in pass 1, so it encodes
    # absolute even though it lands below $100-aligned offsets in ROM space.
    src = """
    lda later
later = $90
"""
    assert body(src) == bytes([0xAD, 0x90, 0x00])


def test_cartridge_padding_and_overflow():
    rom = assemble_cartridge(".org $F000\nnop")
    assert len(rom) == 4096 and rom[0] == 0xEA
    with pytest.raises(AsmError, match="exceeds"):
        assemble_cartridge(
            ".org $F000\n" + "\n".join([".byte " + ",".join(["1"] * 16)] * 300)
        )


def test_undefined_symbol_errors():
    with pytest.raises(AsmError, match="undefined symbol"):
        body("lda missing")
