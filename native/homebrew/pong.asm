; =============================================================================
; PONG2P — a from-scratch TWO-PLAYER homebrew Atari 2600 cartridge (4K NTSC).
;
; Purpose in this repo: the reference's multi-agent script is
; ppo_pettingzoo_ma_atari.py — param-sharing PPO on 2-player Atari (its
; example env IS Pong).  This cartridge gives that leg a REAL emulated
; 2600 game with two independently-controlled players, so the MA algorithm
; trains on actual cartridge dynamics instead of only the device-resident
; minecraft2d_ma stand-in.
;
;   video  — left paddle (player 0, x 15..22), right paddle (player 1,
;            x 137..144), ball (TIA ball object), top/bottom walls
;            (playfield).  The LAYOUT IS EXACTLY MIRROR-SYMMETRIC about
;            x = 78 (all windows below mirror via e' = 156 - e), so a
;            horizontal frame flip maps player 1's view onto player 0's —
;            the Python env exploits this for egocentric param sharing.
;   audio  — channel 0 plays a continuous tracker tone whose pitch encodes
;            the ball HEIGHT (AUDF0 = BALLY/8): flip-INVARIANT state, so
;            the same audio serves both mirrored views; channel 1 plays
;            event blips (hit / point / serve).
;
; Gameplay: classic pong.  Paddles move up/down 3 px/frame (level-triggered
; joystick input: P0 = SWCHA bits 4/5, P1 = SWCHA bits 0/1, active low).
; The ball bounces off the top/bottom walls; a paddle return adds "english"
; (holding up/down at impact steers the ball to dy = -2/+2).  Horizontal
; speed doubles after 6 rally hits.  A missed ball scores the opponent a
; point and serves anew (direction/height from an LFSR xor'd with the
; power-on frame counter).  First to 21 points ends the game.
;
; RL ABI — the 2-PLAYER extension read by native/atari/abi_env.cc
; (mmtrl_abi2 entry points):
;   $80 SCORE0  player-0 points (binary, wraps)
;   $81 SCORE1  player-1 points
;   $82 STATUS  0 playing / 1 game over
; Extra state for scripted tests: $83 BALLX, $84 BALLY, $87 PAD0Y, $88 PAD1Y.
;
; Timing: 76-cycle compare kernel split into three segments (top wall /
; play area / bottom wall) so the hot loop carries no row-switch tests
; (worst play line ~67 cycles).  Paddles never move horizontally: they are
; strobe-positioned once at boot (RESP0 -> 15; RESP1 -> 135 then a one-time
; HMOVE +2 -> 137); only the ball uses per-frame HMBL deltas.
;
; Build: python tools/asm6502.py native/homebrew/pong.asm native/homebrew/pong.bin
; =============================================================================

; ---- TIA write registers ----------------------------------------------------
VSYNC   = $00
VBLANK  = $01
WSYNC   = $02
NUSIZ0  = $04
NUSIZ1  = $05
COLUP0  = $06
COLUP1  = $07
COLUPF  = $08
COLUBK  = $09
CTRLPF  = $0A
PF0     = $0D
PF1     = $0E
PF2     = $0F
RESP0   = $10
RESP1   = $11
RESBL   = $14
AUDC0   = $15
AUDC1   = $16
AUDF0   = $17
AUDF1   = $18
AUDV0   = $19
AUDV1   = $1A
GRP0    = $1B
GRP1    = $1C
ENABL   = $1F
HMP0    = $20
HMP1    = $21
HMBL    = $24
HMOVE   = $2A
HMCLR   = $2B

; ---- RIOT -------------------------------------------------------------------
SWCHA   = $0280
SWCHB   = $0282
INTIM   = $0284
TIM64T  = $0296

; ---- zero-page variables (RIOT RAM $80-$FF) ----------------------------------
SCORE0  = $80   ; RL ABI: player-0 points
SCORE1  = $81   ; RL ABI: player-1 points
STATUS  = $82   ; RL ABI: 0 play / 1 game over
BALLX   = $83   ; ball left edge, visible x 0-159
BALLY   = $84   ; ball top kernel line
BDX     = $85   ; ball dx per frame: +/-1, +/-2
BDY     = $86   ; ball dy per frame: +/-1, +/-2
PAD0Y   = $87   ; left paddle top row
PAD1Y   = $88   ; right paddle top row
FRAME   = $89   ; frame counter (wraps)
SERVE   = $8A   ; serve countdown; 0 = ball in play
SNDTMR  = $8B   ; event-sound frames remaining
SNDTYP  = $8C   ; 1 hit / 2 point / 3 serve
RAND    = $8D   ; 8-bit LFSR
TBX     = $8E   ; TIA-side ball x (tracks HMOVEs applied)
TMP     = $8F
HITS    = $90   ; rally hit counter (speed-up), reset each point

; ---- game constants ----------------------------------------------------------
WIN_SCORE = 21
PAD_MIN   = 9     ; paddle top clamp (below the top wall)
PAD_MAX   = 167   ; paddle 16 tall -> bottom row 183 (above bottom wall)
PAD_CTR   = 88
FAST_AT   = 6     ; rally hits at which horizontal speed doubles
SERVE_X   = 78    ; self-mirror: 156 - 78 = 78

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
    ldx #$10
clr_zp:
    sta SCORE0,X
    dex
    bpl clr_zp

    ; static TIA config
    lda #$0E          ; bright left paddle (luma 7)
    sta COLUP0
    lda #$0C          ; right paddle slightly dimmer (luma 6)
    sta COLUP1
    lda #$0E          ; bright walls + ball
    sta COLUPF
    lda #$21          ; playfield reflect + 4px ball
    sta CTRLPF
    lda #0            ; single-width 8px players
    sta NUSIZ0
    sta NUSIZ1
    sta HMCLR

    ; boot strobe positioning, calibrated to tia_video.h strobe_pos():
    ; x = 3*cycles - 68 + 5 (players) / + 4 (ball), delay loop = 5N+1 cycles
    sta WSYNC
    ldx #5
p0dly:
    dex
    bne p0dly
    sta RESP0         ; 26 cycles -> x = 3*26 - 63 = 15
    sta WSYNC
    ldx #13
p1dly:
    dex
    bne p1dly
    sta RESP1         ; 66 cycles -> x = 3*66 - 63 = 135
    sta WSYNC
    ldx #10
bldly:
    dex
    bne bldly
    sta RESBL         ; 51 cycles -> x = 3*51 - 64 = 89
    ; one-time +2 nudge of player 1: 135 -> 137.  P0 spans x [15,22], so
    ; its exact mirror (x <-> 159-x) is [137,144] — P1 lands precisely
    ; there, and the hit windows in the logic below mirror the same way.
    lda #$E0          ; HM nibble -(-2): move +2
    sta HMP1
    sta WSYNC
    sta HMOVE
    sta HMCLR
    lda #89
    sta TBX
    lda #89
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
    jsr motion        ; writes HMBL, then WSYNC + HMOVE

vb_wait:
    lda INTIM
    bne vb_wait
    sta WSYNC
    lda #0
    sta VBLANK

    ; ---- visible kernel: 192 lines in three segments -------------------------
    ; segment 1: top wall rows 0-7 (full-width playfield, no objects)
    lda #$F0
    sta PF0
    lda #$FF
    sta PF1
    sta PF2
    ldx #0
ktop:
    sta WSYNC
    inx
    cpx #8
    bne ktop
    ; segment 2: play area rows 8-183 (row 8 itself is the PF-clear line)
    sta WSYNC
    lda #0
    sta PF0
    sta PF1
    sta PF2
    inx
kplay:
    sta WSYNC
    ; ball: enabled when 0 <= line - BALLY < 4
    txa
    sec
    sbc BALLY
    cmp #4
    bcs kboff
    lda #2
    bne kbst
kboff:
    lda #0
kbst:
    sta ENABL
    ; left paddle: rows PAD0Y..PAD0Y+15
    txa
    sec
    sbc PAD0Y
    cmp #16
    bcs kp0off
    lda #$FF
    bne kp0st
kp0off:
    lda #0
kp0st:
    sta GRP0
    ; right paddle: rows PAD1Y..PAD1Y+15
    txa
    sec
    sbc PAD1Y
    cmp #16
    bcs kp1off
    lda #$FF
    bne kp1st
kp1off:
    lda #0
kp1st:
    sta GRP1
    inx
    cpx #184
    bne kplay
    ; segment 3: bottom wall rows 184-191
    sta WSYNC
    lda #0
    sta ENABL
    sta GRP0
    sta GRP1
    lda #$F0
    sta PF0
    lda #$FF
    sta PF1
    sta PF2
    inx
kbot:
    sta WSYNC
    inx
    cpx #192
    bne kbot

    ; ---- overscan: 30 lines ---------------------------------------------------
    lda #2
    sta VBLANK
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

    ; GAME RESET console switch -> new game (folds the frame counter into
    ; the LFSR so reset timing randomizes the serve)
    lda SWCHB
    and #1
    bne no_reset
    lda RAND
    eor FRAME
    sta RAND
    jsr new_game
no_reset:

    ; status backdrop: play $00 / game over $42
    lda STATUS
    beq bk_play
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

    ; ---- paddle input (level-triggered, 3 px/frame) ------------------------
    ; player 0: SWCHA bit 4 up / bit 5 down (active low)
    lda SWCHA
    and #$10
    bne p0_no_up
    lda PAD0Y
    sec
    sbc #3
    cmp #PAD_MIN
    bcs p0u_ok
    lda #PAD_MIN
p0u_ok:
    sta PAD0Y
p0_no_up:
    lda SWCHA
    and #$20
    bne p0_no_dn
    lda PAD0Y
    clc
    adc #3
    cmp #PAD_MAX
    bcc p0d_ok
    lda #PAD_MAX
p0d_ok:
    sta PAD0Y
p0_no_dn:
    ; player 1: SWCHA bit 0 up / bit 1 down (active low)
    lda SWCHA
    and #$01
    bne p1_no_up
    lda PAD1Y
    sec
    sbc #3
    cmp #PAD_MIN
    bcs p1u_ok
    lda #PAD_MIN
p1u_ok:
    sta PAD1Y
p1_no_up:
    lda SWCHA
    and #$02
    bne p1_no_dn
    lda PAD1Y
    clc
    adc #3
    cmp #PAD_MAX
    bcc p1d_ok
    lda #PAD_MAX
p1d_ok:
    sta PAD1Y
p1_no_dn:

    ; ---- serve countdown (ball visible + stationary at the serve spot) -----
    lda SERVE
    beq ball_move
    dec SERVE
    rts

    ; ---- ball motion ------------------------------------------------------------
ball_move:
    lda BALLX
    clc
    adc BDX
    sta BALLX

    lda BALLY
    clc
    adc BDY
    sta BALLY
    ; top bounce: force BDY positive at/above row 10
    cmp #11
    bcs not_top
    lda BDY
    bpl not_top
    jsr neg_bdy
not_top:
    lda BALLY
    cmp #178
    bcc not_bot
    lda BDY
    bmi not_bot
    jsr neg_bdy
not_bot:

    ; side checks by travel direction
    lda BDX
    bmi left_chk
    jmp right_side
left_chk:
    jmp left_side

neg_bdy:
    lda #0
    sec
    sbc BDY
    sta BDY
    rts

; horizontal speed from rally length: 1 below FAST_AT hits, 2 at/above
speed:
    lda HITS
    cmp #FAST_AT
    bcs spd2
    lda #1
    rts
spd2:
    lda #2
    rts

; ---- left side: hit window [12,23], behind-paddle [5,11], point at <= 4 ----
left_side:
    lda BALLX
    cmp #24
    bcs ls_done       ; still right of the window
    cmp #5
    bcc ls_p1pt       ; passed the paddle line entirely
    cmp #12
    bcc ls_done       ; behind the paddle, still flying
    ; vertical overlap: BALLY+3 >= PAD0Y  &&  BALLY <= PAD0Y+15
    lda BALLY
    clc
    adc #3
    cmp PAD0Y
    bcc ls_done
    lda PAD0Y
    clc
    adc #15
    cmp BALLY
    bcc ls_done
    ; ---- HIT by player 0 ----
    inc HITS
    jsr speed
    sta BDX           ; now moving right
    lda #24
    sta BALLX
    ; english from the held P0 direction
    lda SWCHA
    and #$10
    bne ls_no_eu
    lda #$FE          ; up held -> dy = -2
    sta BDY
ls_no_eu:
    lda SWCHA
    and #$20
    bne ls_no_ed
    lda #2            ; down held -> dy = +2
    sta BDY
ls_no_ed:
    lda #1
    sta SNDTYP
    lda #8
    sta SNDTMR
ls_done:
    rts
ls_p1pt:
    inc SCORE1
    lda SCORE1
    cmp #WIN_SCORE
    bcc ls_serve
    lda #1
    sta STATUS
ls_serve:
    jsr point_reset
    rts

; ---- right side: hit window [133,144], behind [145,151], point at >= 152 ----
; (exact mirrors of the left side via e' = 156 - e)
right_side:
    lda BALLX
    cmp #133
    bcc rs_done       ; still left of the window
    cmp #152
    bcs rs_p0pt       ; passed the paddle line entirely
    cmp #145
    bcs rs_done       ; behind the paddle, still flying
    ; vertical overlap: BALLY+3 >= PAD1Y  &&  BALLY <= PAD1Y+15
    lda BALLY
    clc
    adc #3
    cmp PAD1Y
    bcc rs_done
    lda PAD1Y
    clc
    adc #15
    cmp BALLY
    bcc rs_done
    ; ---- HIT by player 1 ----
    inc HITS
    jsr speed
    jsr neg_a         ; A = -speed: now moving left
    sta BDX
    lda #132
    sta BALLX
    ; english from the held P1 direction
    lda SWCHA
    and #$01
    bne rs_no_eu
    lda #$FE
    sta BDY
rs_no_eu:
    lda SWCHA
    and #$02
    bne rs_no_ed
    lda #2
    sta BDY
rs_no_ed:
    lda #1
    sta SNDTYP
    lda #8
    sta SNDTMR
rs_done:
    rts
rs_p0pt:
    inc SCORE0
    lda SCORE0
    cmp #WIN_SCORE
    bcc rs_serve
    lda #1
    sta STATUS
rs_serve:
    jsr point_reset
    rts

neg_a:
    sta TMP
    lda #0
    sec
    sbc TMP
    rts

; after a point: rally counter resets, point blip, new serve
point_reset:
    lda #0
    sta HITS
    lda #2
    sta SNDTYP
    lda #12
    sta SNDTMR
    jsr serve_start
    rts

; place the ball for a serve; direction/height from the LFSR
serve_start:
    lda #SERVE_X
    sta BALLX
    lda RAND
    and #$7F
    clc
    adc #30           ; serve y in 30..157
    sta BALLY
    lda RAND
    bmi srv_left
    lda #1
    sta BDX
    bne srv_dy
srv_left:
    lda #$FF
    sta BDX
srv_dy:
    lda RAND
    and #$40
    beq srv_dn
    lda #$FF
    sta BDY
    bne srv_tmr
srv_dn:
    lda #1
    sta BDY
srv_tmr:
    lda #40
    sta SERVE
    lda #3
    sta SNDTYP
    lda #6
    sta SNDTMR
    rts

new_game:
    lda #0
    sta SCORE0
    sta SCORE1
    sta STATUS
    sta HITS
    lda #PAD_CTR
    sta PAD0Y
    sta PAD1Y
    jsr serve_start
    rts

; =============================================================================
; per-frame sound: ch0 = ball-height tracker tone (flip-invariant state),
; ch1 = event blips
; =============================================================================
sound:
    lda STATUS
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
    lda #4            ; high blip on a paddle hit
    sta AUDF1
    rts
ev_not_hit:
    cmp #2
    bne ev_serve
    lda #6
    sta AUDC1
    lda #24           ; low buzz on a point
    sta AUDF1
    rts
ev_serve:
    lda #4
    sta AUDC1
    lda #12           ; mid blip on a serve
    sta AUDF1
    rts
ev_off:
    lda #0
    sta AUDV1
    rts

; =============================================================================
; object motion: ball-only HMBL delta (clamped to +/-7) + one HMOVE
; (paddles never move horizontally)
; =============================================================================
motion:
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
