; =============================================================================
; BRICK — a from-scratch homebrew Atari 2600 cartridge (4K NTSC).
;
; Purpose in this repo: the reference's Atari benchmark leg names Breakout
; as a headline game (cleanrl dqn_atari/ppo_atari docs), but ale-py and its
; ROM set are unreachable here (zero egress).  BRICK is a Breakout-class
; game authored in-repo — destructible playfield state, row-scored bricks,
; paddle/ball physics — so the Atari-leg algorithms (PPO/DQN/C51) can be
; measured on a REAL cartridge with Breakout's task structure, running on
; the from-scratch 2600 core (native/atari).  Third cartridge overall after
; the reference's SkelPlus.bin and the in-repo rally.asm.
;
; Multimodal by design (same discipline as rally.asm):
;   video  — 4 rows x 16 columns of mirrored-playfield bricks (PF1/PF2 from
;            RAM per 8-line band), TIA ball, double-width player-0 paddle,
;            side/top walls.
;   audio  — channel 0 plays a continuous tracker tone whose frequency
;            encodes ball HEIGHT (AUDF0 = ball_y/8); channel 1 plays event
;            blips where a BRICK hit's pitch encodes the brick ROW — the
;            audio stream carries true game state every frame.
;
; Gameplay: the ball serves downward; the paddle returns it ("english"
; steering with a held direction).  Bricks score on contact — top two rows
; +2, bottom two rows +1 — and the ball bounces off them.  Clearing the
; 64-brick wall refills it once at DOUBLE vertical ball speed; clearing the
; second wall wins (max score 192).  A miss costs a life (3 per game).
; GAME RESET (SWCHB bit 0) starts a new game; serve position/direction come
; from an LFSR xor'd with the power-on frame counter, so reset timing
; randomizes episodes.
;
; RL ABI (read by native/atari/abi_env.cc — the documented contract for
; in-repo homebrew cartridges):
;   $80 SCORE   binary, increments on reward events
;   $81 LIVES   remaining lives
;   $82 STATUS  0 playing / 1 game over / 2 win
; Extra state for scripted tests: $83 BALLX, $84 BALLY, $87 PADX,
; $98 BRICKS (bricks remaining in the current wall), $99 WALLS.
;
; Timing notes: the kernel is phase-structured (top wall / gap / 4 brick
; bands / open field / paddle rows / bottom), each phase a tight WSYNC loop
; well under the 76-cycle line budget; brick-band PF1/PF2 loads land in
; hblank at each band's first line.  Object X motion uses HMxx/HMOVE deltas
; against software-tracked positions exactly as rally.asm does; the boot
; strobe positions (75 paddle / 89 ball) are calibrated to the in-repo
; renderer's strobe model (tia_video.h strobe_pos).
;
; Build: python tools/asm6502.py native/homebrew/brick.asm native/homebrew/brick.bin
; =============================================================================

; ---- TIA write registers ----------------------------------------------------
VSYNC   = $00
VBLANK  = $01
WSYNC   = $02
NUSIZ0  = $04
COLUP0  = $06
COLUPF  = $08
COLUBK  = $09
CTRLPF  = $0A
PF0     = $0D
PF1     = $0E
PF2     = $0F
RESP0   = $10
RESBL   = $14
AUDC0   = $15
AUDC1   = $16
AUDF0   = $17
AUDF1   = $18
AUDV0   = $19
AUDV1   = $1A
GRP0    = $1B
ENABL   = $1F
HMP0    = $20
HMBL    = $24
HMOVE   = $2A
HMCLR   = $2B

; ---- TIA read registers -----------------------------------------------------
INPT4   = $0C

; ---- RIOT -------------------------------------------------------------------
SWCHA   = $0280
SWCHB   = $0282
INTIM   = $0284
TIM64T  = $0296

; ---- zero-page variables (RIOT RAM $80-$FF) ----------------------------------
SCORE   = $80   ; RL ABI: score
LIVES   = $81   ; RL ABI: lives
STATUS  = $82   ; RL ABI: 0 play / 1 game over / 2 win
BALLX   = $83   ; ball left edge, visible x 0-159
BALLY   = $84   ; ball top kernel line 0-191 (200 = hidden)
BDX     = $85   ; ball dx per frame: $01 / $FF
BDY     = $86   ; ball dy per frame: +-1 (wall 1) / +-2 (wall 2)
PADX    = $87   ; paddle left edge x
FRAME   = $88   ; frame counter (wraps)
SERVE   = $89   ; serve countdown; 0 = ball in play
SNDTMR  = $8A   ; event-sound frames remaining
SNDTYP  = $8B   ; 1 paddle hit / 2 miss / 3 serve / 4 brick
RAND    = $8C   ; 8-bit LFSR
TBX     = $8D   ; TIA-side ball x (tracks HMOVEs applied)
TPX     = $8E   ; TIA-side paddle x
TMP     = $8F
BRICK1  = $90   ; 4 bytes: PF1 brick bits per row (rows 0-3 top to bottom)
BRICK2  = $94   ; 4 bytes: PF2 brick bits per row
BRICKS  = $98   ; bricks remaining in the current wall (64 when full)
WALLS   = $99   ; walls remaining (2 at new game; 0 = win)
SNDROW  = $9A   ; row of the last brick hit (event-blip pitch)

; ---- game constants ----------------------------------------------------------
BAND_TOP  = 24    ; first brick band line; bands are 8 lines x 4 rows -> 24-55
PAD_TOP   = 176   ; paddle rows PAD_TOP..PAD_TOP+7 (must be 8-aligned)
HIT_LO    = 171   ; ball-y window where paddle contact is tested
HIT_HI    = 177
MISS_Y    = 186   ; ball-y at/below which the ball is lost
LEFT_MIN  = 4     ; ball x bounce bounds
RIGHT_MAX = 152
PAD_MIN   = 4     ; paddle x clamp
PAD_MAX   = 140

    .org $F000

; =============================================================================
reset:
    sei
    cld
    ldx #$FF
    txs
    ; clear TIA $00-$2C (hits WSYNC harmlessly) and our zero page $80-$9A
    lda #0
    ldx #$2C
clr_tia:
    sta $00,X
    dex
    bpl clr_tia
    ldx #$1A
clr_zp:
    sta SCORE,X
    dex
    bpl clr_zp

    ; static TIA config
    lda #$0E          ; bright paddle (luma 7)
    sta COLUP0
    lda #$5E          ; bricks/walls/ball hue
    sta COLUPF
    lda #$21          ; playfield reflect + 4px ball
    sta CTRLPF
    lda #5            ; double-width player 0 (16 px paddle)
    sta NUSIZ0
    sta HMCLR

    ; boot strobe positioning, calibrated to tia_video.h strobe_pos():
    ; paddle: 46 cycles after WSYNC -> x = 3*46 - 68 + 5 = 75
    sta WSYNC
    ldx #9
p0dly:
    dex
    bne p0dly
    sta RESP0
    ; ball: 51 cycles after WSYNC -> x = 3*51 - 68 + 4 = 89
    sta WSYNC
    ldx #10
bldly:
    dex
    bne bldly
    sta RESBL
    lda #75
    sta TPX
    sta PADX
    lda #89
    sta TBX
    sta BALLX

    lda #1
    sta RAND
    jsr new_game

; =============================================================================
frame_loop:
    ; ---- vertical sync (3 lines) -------------------------------------------
    lda #2
    sta VSYNC
    sta WSYNC
    sta WSYNC
    sta WSYNC
    lda #0
    sta VSYNC

    ; ---- vertical blank: timer + game logic ---------------------------------
    lda #2
    sta VBLANK
    lda #43           ; 43*64 = 2752 cycles ~ 36 scanlines
    sta TIM64T

    jsr logic
    jsr sound
    jsr motion        ; writes HMP0/HMBL, then WSYNC + HMOVE

    ; preset the top-wall playfield for kernel entry
    lda #$F0
    sta PF0
    lda #$FF
    sta PF1
    sta PF2

vb_wait:
    lda INTIM
    bne vb_wait
    sta WSYNC
    lda #0
    sta VBLANK

    ; ---- visible kernel: 192 lines, phase-structured --------------------------
    ldx #0
ph_top:               ; lines 0-7: full-width top wall
    sta WSYNC
    inx
    cpx #8
    bne ph_top

    ; line 8: side-walls-only playfield (writes land in hblank); the top
    ; bounce clamps BALLY >= 9 so the ball never needs drawing this high
    sta WSYNC
    lda #$10
    sta PF0
    lda #0
    sta PF1
    sta PF2
    sta ENABL
    inx               ; X = 9

ph_gap:               ; lines 9-23: ball only
    sta WSYNC
    txa
    sec
    sbc BALLY
    cmp #4
    bcs g_off
    lda #2
    bne g_store
g_off:
    lda #0
g_store:
    sta ENABL
    inx
    cpx #BAND_TOP
    bne ph_gap

    ; lines 24-55: 4 brick bands of 8 lines; Y counts lines, X the band.
    ; Band-start order: ball ENABL first (lands in hblank), then PF1/PF2
    ; (land before playfield dot 4 / dot 12 reach the beam).
    ldy #BAND_TOP
    ldx #0
ph_band:
    sta WSYNC
    tya
    sec
    sbc BALLY
    cmp #4
    bcs b_off
    lda #2
    bne b_store
b_off:
    lda #0
b_store:
    sta ENABL
    lda BRICK1,X
    sta PF1
    lda BRICK2,X
    sta PF2
    iny
    lda #7
    sta TMP
band_lines:           ; 7 more lines of this band, ball only
    sta WSYNC
    tya
    sec
    sbc BALLY
    cmp #4
    bcs bl_off
    lda #2
    bne bl_store
bl_off:
    lda #0
bl_store:
    sta ENABL
    iny
    dec TMP
    bne band_lines
    inx
    cpx #4
    bne ph_band

    ; line 56: clear the brick playfield (hblank), ball continues
    sta WSYNC
    lda #0
    sta PF1
    sta PF2
    tya
    sec
    sbc BALLY
    cmp #4
    bcs c_off
    lda #2
    bne c_store
c_off:
    lda #0
c_store:
    sta ENABL
    iny
    tya
    tax               ; line counter back in X (= 57)

ph_open:              ; lines 57-175: ball only
    sta WSYNC
    txa
    sec
    sbc BALLY
    cmp #4
    bcs o_off
    lda #2
    bne o_store
o_off:
    lda #0
o_store:
    sta ENABL
    inx
    cpx #PAD_TOP
    bne ph_open

    ; line 176: paddle on (hblank write)
    sta WSYNC
    lda #$FF
    sta GRP0
    txa
    sec
    sbc BALLY
    cmp #4
    bcs p1_off
    lda #2
    bne p1_store
p1_off:
    lda #0
p1_store:
    sta ENABL
    inx

ph_pad:               ; lines 177-183
    sta WSYNC
    txa
    sec
    sbc BALLY
    cmp #4
    bcs p_off
    lda #2
    bne p_store
p_off:
    lda #0
p_store:
    sta ENABL
    inx
    cpx #184
    bne ph_pad

    ; line 184: paddle off
    sta WSYNC
    lda #0
    sta GRP0
    txa
    sec
    sbc BALLY
    cmp #4
    bcs p2_off
    lda #2
    bne p2_store
p2_off:
    lda #0
p2_store:
    sta ENABL
    inx

ph_bot:               ; lines 185-191
    sta WSYNC
    txa
    sec
    sbc BALLY
    cmp #4
    bcs bo_off
    lda #2
    bne bo_store
bo_off:
    lda #0
bo_store:
    sta ENABL
    inx
    cpx #192
    bne ph_bot

    ; ---- overscan: 30 lines ---------------------------------------------------
    lda #2
    sta VBLANK
    lda #0
    sta GRP0
    sta ENABL
    ldx #30
os_loop:
    sta WSYNC
    dex
    bne os_loop
    jmp frame_loop

; =============================================================================
; per-frame game logic
; =============================================================================
logic:
    inc FRAME
    ; 8-bit LFSR (taps $1D), reseeded if it ever hits zero
    lda RAND
    bne rnd_nz
    lda #$2B
rnd_nz:
    asl A
    bcc rnd_ok
    eor #$1D
rnd_ok:
    sta RAND

    ; GAME RESET console switch -> new game (also folds the frame counter
    ; into the LFSR so reset timing randomizes the serve)
    lda SWCHB
    and #1
    bne no_reset
    lda RAND
    eor FRAME
    sta RAND
    jsr new_game
no_reset:

    ; status backdrop: play $00 / game over $42 / win $C6
    lda STATUS
    beq bk_play
    cmp #1
    beq bk_over
    lda #$C6
    bne bk_store
bk_over:
    lda #$42
    bne bk_store
bk_play:
    lda #0
bk_store:
    sta COLUBK

    lda STATUS
    beq in_play
    rts               ; frozen until GAME RESET
in_play:

    ; ---- paddle input (level-triggered, 2 px/frame) ------------------------
    lda SWCHA
    and #$40          ; P0 left, active low
    bne no_left
    lda PADX
    sec
    sbc #2
    cmp #PAD_MIN
    bcs pl_ok
    lda #PAD_MIN
pl_ok:
    sta PADX
no_left:
    lda SWCHA
    and #$80          ; P0 right
    bne no_right
    lda PADX
    clc
    adc #2
    cmp #PAD_MAX
    bcc pr_ok
    lda #PAD_MAX
pr_ok:
    sta PADX
no_right:

    ; ---- serve countdown ------------------------------------------------------
    lda SERVE
    beq ball_move
    lda INPT4         ; fire button serves immediately
    bmi no_fire
    lda #1
    sta SERVE
no_fire:
    dec SERVE
    rts

    ; ---- ball motion ------------------------------------------------------------
ball_move:
    lda BALLX
    clc
    adc BDX
    sta BALLX
    cmp #LEFT_MIN+1
    bcs not_left
    lda #1
    sta BDX
not_left:
    lda BALLX
    cmp #RIGHT_MAX
    bcc not_right
    lda #$FF
    sta BDX
not_right:

    lda BALLY
    clc
    adc BDY
    sta BALLY
    cmp #9            ; top wall: bounce down, clamp (kernel invariant y >= 9)
    bcs not_top
    jsr speed
    sta BDY
    lda #9
    sta BALLY
not_top:

    ; ---- brick collision: ball centre row/column vs the RAM wall -------------
    lda BALLY
    clc
    adc #2
    sec
    sbc #BAND_TOP     ; A = centre row - band top
    cmp #32
    bcs no_brick      ; outside the 4x8-line brick region
    lsr A
    lsr A
    lsr A             ; band row 0-3
    tax
    ; column: cx = BALLX + 2, mirrored right half (reflected playfield)
    lda BALLX
    clc
    adc #2
    cmp #80
    bcc col_left
    sta TMP
    lda #159
    sec
    sbc TMP
col_left:
    lsr A
    lsr A             ; playfield dot 0-19
    cmp #4
    bcc no_brick      ; dots 0-3 are PF0 (wall/gap) — no bricks
    cmp #12
    bcs col_pf2
    sec
    sbc #4
    tay
    lda mask1,Y       ; PF1 dot mask (MSB-first register)
    sta TMP
    lda BRICK1,X
    and TMP
    beq no_brick
    lda BRICK1,X
    eor TMP
    sta BRICK1,X
    jmp brick_hit
col_pf2:
    sec
    sbc #12
    tay
    lda mask2,Y       ; PF2 dot mask (LSB-first register)
    sta TMP
    lda BRICK2,X
    and TMP
    beq no_brick
    lda BRICK2,X
    eor TMP
    sta BRICK2,X
brick_hit:
    ; score: top two rows +2, bottom two +1 (X = band row)
    inc SCORE
    cpx #2
    bcs bh_low
    inc SCORE
bh_low:
    dec BRICKS
    ; bounce: reverse vertical direction
    lda #0
    sec
    sbc BDY
    sta BDY
    ; event blip whose pitch encodes the row
    stx SNDROW
    lda #4
    sta SNDTYP
    lda #8
    sta SNDTMR
    ; wall cleared?
    lda BRICKS
    bne no_brick
    dec WALLS
    bne next_wall
    lda #2            ; WIN
    sta STATUS
    lda #200
    sta BALLY
    rts
next_wall:
    jsr fill_bricks
    jsr serve_start   ; wall 2 serves at double speed via speed()
no_brick:

    ; ---- paddle contact window (only while moving down) ----------------------
    lda BDY
    bmi done_ball
    lda BALLY
    cmp #HIT_LO
    bcc done_ball
    cmp #HIT_HI
    bcs check_miss
    ; horizontal overlap: BALLX+3 >= PADX  &&  BALLX <= PADX+15
    lda BALLX
    clc
    adc #3
    cmp PADX
    bcc done_ball
    lda PADX
    clc
    adc #15
    cmp BALLX
    bcc done_ball
    ; ---- paddle HIT (no score in BRICK — bricks are the reward) ----
    jsr speed
    eor #$FF
    clc
    adc #1            ; A = -speed
    sta BDY
    lda #170
    sta BALLY
    lda #1
    sta SNDTYP
    lda #6
    sta SNDTMR
    ; english: steer with the held direction
    lda SWCHA
    and #$40
    bne eng_nl
    lda #$FF
    sta BDX
eng_nl:
    lda SWCHA
    and #$80
    bne eng_nr
    lda #1
    sta BDX
eng_nr:
    rts

check_miss:
    lda BALLY
    cmp #MISS_Y
    bcc done_ball
    ; ---- MISS ----
    lda #2
    sta SNDTYP
    lda #12
    sta SNDTMR
    dec LIVES
    bne serve_again
    lda #1
    sta STATUS
    lda #200
    sta BALLY
    rts
serve_again:
    jsr serve_start
done_ball:
    rts

; vertical ball speed: 1 on the first wall, 2 on the second
speed:
    lda WALLS
    cmp #2
    bcs spd1
    lda #2
    rts
spd1:
    lda #1
    rts

; place the ball for a serve; direction/position from the LFSR
serve_start:
    lda RAND
    and #$3F
    clc
    adc #40           ; serve x in 40..103
    sta BALLX
    lda #64           ; below the brick wall, heading down
    sta BALLY
    jsr speed
    sta BDY
    lda RAND
    bmi srv_left
    lda #1
    sta BDX
    bne srv_done
srv_left:
    lda #$FF
    sta BDX
srv_done:
    lda #40
    sta SERVE
    lda #3
    sta SNDTYP
    lda #8
    sta SNDTMR
    rts

; refill the 4x16 brick wall
fill_bricks:
    lda #$FF
    ldx #3
fb_loop:
    sta BRICK1,X
    sta BRICK2,X
    dex
    bpl fb_loop
    lda #64
    sta BRICKS
    rts

new_game:
    lda #0
    sta SCORE
    sta STATUS
    lda #3
    sta LIVES
    lda #2
    sta WALLS
    jsr fill_bricks
    jsr serve_start
    rts

; =============================================================================
; per-frame sound: ch0 = ball-height tracker tone, ch1 = event blips
; =============================================================================
sound:
    lda STATUS
    bne trk_off
    lda SERVE
    bne trk_off
    lda BALLY
    lsr A
    lsr A
    lsr A
    sta AUDF0         ; pitch encodes ball height (0-23 of 0-31)
    lda #4            ; pure tone
    sta AUDC0
    lda #6
    sta AUDV0
    jmp snd_ev
trk_off:
    lda #0
    sta AUDV0
snd_ev:
    lda SNDTMR
    beq ev_off
    dec SNDTMR
    lda #12
    sta AUDV1
    lda SNDTYP
    cmp #1
    bne ev_not_hit
    lda #4
    sta AUDC1
    lda #8            ; paddle: mid blip
    sta AUDF1
    rts
ev_not_hit:
    cmp #2
    bne ev_not_miss
    lda #6
    sta AUDC1
    lda #24           ; miss: low buzz
    sta AUDF1
    rts
ev_not_miss:
    cmp #3
    bne ev_brick
    lda #4
    sta AUDC1
    lda #12           ; serve blip
    sta AUDF1
    rts
ev_brick:
    lda #4
    sta AUDC1
    lda SNDROW        ; brick: pitch encodes the row (4/8/12/16)
    asl A
    asl A
    clc
    adc #4
    sta AUDF1
    rts
ev_off:
    lda #0
    sta AUDV1
    rts

; =============================================================================
; object motion: HMxx deltas (clamped to +/-7) + one HMOVE after WSYNC
; =============================================================================
motion:
    ; ball
    lda BALLX
    sec
    sbc TBX
    jsr clamp7
    sta TMP
    clc
    adc TBX
    sta TBX
    lda #0
    sec
    sbc TMP           ; HM nibble is -delta in the high 4 bits
    and #$0F
    asl A
    asl A
    asl A
    asl A
    sta HMBL
    ; paddle
    lda PADX
    sec
    sbc TPX
    jsr clamp7
    sta TMP
    clc
    adc TPX
    sta TPX
    lda #0
    sec
    sbc TMP
    and #$0F
    asl A
    asl A
    asl A
    asl A
    sta HMP0
    sta WSYNC
    sta HMOVE
    rts

clamp7:
    ; clamp signed A to [-7, 7]
    bmi cl_neg
    cmp #8
    bcc cl_ok
    lda #7
    rts
cl_neg:
    cmp #$F9
    bcs cl_ok
    lda #$F9
cl_ok:
    rts

; ---- playfield dot masks ------------------------------------------------------
; PF1 draws dots 4-11 MSB-first; PF2 draws dots 12-19 LSB-first
; (tia_video.h:153-155).
mask1:
    .byte $80,$40,$20,$10,$08,$04,$02,$01
mask2:
    .byte $01,$02,$04,$08,$10,$20,$40,$80

; =============================================================================
    .org $FFFC
    .word reset, reset
