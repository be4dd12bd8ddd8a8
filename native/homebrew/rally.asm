; =============================================================================
; RALLY — a from-scratch homebrew Atari 2600 cartridge (4K NTSC).
;
; Purpose in this repo: the reference framework ships exactly ONE cartridge
; (environments/skeleton_plus/SkelPlus.bin).  Rally is a SECOND, original
; cartridge that proves the in-repo 2600 core (native/atari) is a
; game-general ALE-class engine rather than a single-ROM adapter.  It is a
; wall-ball / squash game designed to be a genuinely MULTIMODAL RL task:
;
;   video  — ball (TIA ball object), paddle (player 0, double width),
;            walls (playfield, reflected).
;   audio  — channel 0 plays a continuous "tracker" tone whose frequency
;            encodes the ball's HEIGHT (AUDF0 = ball_y/8), so the audio
;            stream carries real state information every frame; channel 1
;            plays event blips (serve / paddle hit / miss).
;
; Gameplay: the ball bounces off the top and side walls; the player moves
; the bottom paddle left/right.  Each paddle return scores +1 (with
; "english": holding a direction at impact steers the ball).  From 8 points
; the ball serves/bounces at double vertical speed.  Missing costs a life
; (3 per game).  21 points wins.  GAME RESET (SWCHB bit 0) starts a new
; game; the serve position/direction comes from an LFSR xor'd with the
; power-on frame counter, so reset timing randomizes episodes.
;
; RL ABI (read by native/atari/abi_env.cc — the documented contract for
; in-repo homebrew cartridges):
;   $80 SCORE   binary, increments on reward events
;   $81 LIVES   remaining lives
;   $82 STATUS  0 playing / 1 game over / 2 win
; Extra state for scripted tests: $83 BALLX, $84 BALLY, $87 PADX.
;
; Timing notes: the kernel is a 76-cycle-budget compare kernel (WSYNC per
; line, worst line ~56 cycles); object X motion is done exclusively with
; HMxx/HMOVE deltas (<=7 px/frame) against software-tracked TIA positions,
; so no cycle-counted repositioning is needed after boot.  The two boot
; strobes (RESP0/RESBL) use counted delay loops; the resulting positions
; (75 and 89) are calibrated to the in-repo renderer's strobe model
; (tia_video.h strobe_pos: x = 3*cycles - 68 + offset) and are within a few
; pixels of real-hardware behavior.
;
; Build: python tools/asm6502.py native/homebrew/rally.asm native/homebrew/rally.bin
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
BDY     = $86   ; ball dy per frame: $01,$02 / $FF,$FE
PADX    = $87   ; paddle left edge x
FRAME   = $88   ; frame counter (wraps)
SERVE   = $89   ; serve countdown; 0 = ball in play
SNDTMR  = $8A   ; event-sound frames remaining
SNDTYP  = $8B   ; 1 hit / 2 miss / 3 serve
RAND    = $8C   ; 8-bit LFSR
TBX     = $8D   ; TIA-side ball x (tracks HMOVEs applied)
TPX     = $8E   ; TIA-side paddle x
TMP     = $8F

; ---- game constants ----------------------------------------------------------
PAD_TOP   = 176   ; paddle rows PAD_TOP..PAD_TOP+7 (must be 8-aligned)
HIT_LO    = 171   ; ball-y window where paddle contact is tested
HIT_HI    = 177
MISS_Y    = 186   ; ball-y at/below which the ball is lost
WIN_SCORE = 21
FAST_AT   = 8     ; score at which vertical speed doubles
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
    ; clear TIA $00-$2C (hits WSYNC harmlessly) and our zero page
    lda #0
    ldx #$2C
clr_tia:
    sta $00,X
    dex
    bpl clr_tia
    ldx #$0F
clr_zp:
    sta SCORE,X
    dex
    bpl clr_zp

    ; static TIA config
    lda #$0E          ; bright paddle (luma 7)
    sta COLUP0
    lda #$0E          ; bright walls + ball
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

vb_wait:
    lda INTIM
    bne vb_wait
    sta WSYNC
    lda #0
    sta VBLANK

    ; ---- visible kernel: 192 lines ------------------------------------------
    ; top wall rows 0-7: full-width playfield
    lda #$F0
    sta PF0
    lda #$FF
    sta PF1
    sta PF2
    ldx #0
line_loop:
    sta WSYNC
    ; switch to side-walls-only playfield at row 8 (first thing after
    ; WSYNC so the write lands inside hblank — no mid-line seam)
    cpx #8
    bne not_row8
    lda #$10
    sta PF0
    lda #0
    sta PF1
    sta PF2
not_row8:
    ; ball: enabled when 0 <= line - BALLY < 4
    txa
    sec
    sbc BALLY
    cmp #4
    bcs lb_off
    lda #2
    bne lb_store
lb_off:
    lda #0
lb_store:
    sta ENABL
    ; paddle: rows PAD_TOP..PAD_TOP+7
    txa
    and #$F8
    cmp #PAD_TOP
    beq pad_on
    lda #0
    beq pad_store
pad_on:
    lda #$FF
pad_store:
    sta GRP0
    inx
    cpx #192
    bne line_loop

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
    cmp #9            ; top wall
    bcs not_top
    jsr speed
    sta BDY
not_top:

    ; paddle contact window (only while moving down)
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
    ; ---- HIT ----
    jsr speed
    eor #$FF
    clc
    adc #1            ; A = -speed
    sta BDY
    lda #170
    sta BALLY
    inc SCORE
    lda #1
    sta SNDTYP
    lda #10
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
    lda SCORE
    cmp #WIN_SCORE
    bcc done_ball
    lda #2
    sta STATUS
    lda #200
    sta BALLY
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

; vertical speed from score: 1 below FAST_AT, 2 at/above
speed:
    lda SCORE
    cmp #FAST_AT
    bcs spd2
    lda #1
    rts
spd2:
    lda #2
    rts

; place the ball for a serve; direction/position from the LFSR
serve_start:
    lda RAND
    and #$3F
    clc
    adc #40           ; serve x in 40..103
    sta BALLX
    lda #24
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

new_game:
    lda #0
    sta SCORE
    sta STATUS
    lda #3
    sta LIVES
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
    lda #4            ; high blip
    sta AUDF1
    rts
ev_not_hit:
    cmp #2
    bne ev_serve
    lda #6
    sta AUDC1
    lda #24           ; low buzz
    sta AUDF1
    rts
ev_serve:
    lda #4
    sta AUDC1
    lda #12
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

; =============================================================================
    .org $FFFC
    .word reset, reset
