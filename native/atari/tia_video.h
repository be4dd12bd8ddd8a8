// TIA video — functional catch-up renderer, mask-composed.
//
// Renders each scanline incrementally: every TIA register write first
// draws the beam up to the current color clock with the OLD state, then
// applies the write — so mid-line "racing the beam" updates (playfield
// rewrites per row, sprite repositioning) land at instruction granularity.
// Not cycle-exact (no HMOVE comb, no exact strobe latencies beyond the
// standard +5 offset), but sufficient to rasterize real cartridges'
// playfields and sprites and to latch the collision bits game logic reads.
//
// Rendering is object-mask based: each object (playfield, players,
// missiles, ball) keeps a lazily rebuilt 160-bit scanline mask, rebuilt
// only when one of its registers changes.  A render_to() segment then
// costs word-level AND/OR for all 15 collision pairs plus a sparse
// bit-iteration over object pixels for color priority — the per-pixel
// predicate walk this replaces was 90% of emulator time (gprof; the
// predicates remain below as the oracle for tia_mask equivalence tests).
//
// Geometry: 228 color clocks per scanline = 68 hblank + 160 visible.
// VSYNC writes delimit frames; the machine exposes the last completed
// frame as a 160xH byte image of TIA color indices (COLUxx >> 1).

#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace mmtrl {

class TiaVideo {
 public:
  static constexpr int kVisible = 160;
  static constexpr int kHBlank = 68;
  static constexpr int kMaxLines = 320;

  // ---- register interface (reg = addr & 0x3F) -------------------------
  // Returns true if the write was a video register it consumed.
  bool write(uint8_t reg, uint8_t value, int color_clock) {
    render_to(color_clock);
    switch (reg) {
      case 0x00: {  // VSYNC
        bool on = value & 0x02;
        if (!vsync_ && on) end_frame();
        vsync_ = on;
        return true;
      }
      case 0x01: vblank_ = value & 0x02; return true;
      case 0x04: nusiz_[0] = value; dirty_ |= kDP0 | kDM0; return true;
      case 0x05: nusiz_[1] = value; dirty_ |= kDP1 | kDM1; return true;
      case 0x06: colup_[0] = value; return true;
      case 0x07: colup_[1] = value; return true;
      case 0x08: colupf_ = value; return true;
      case 0x09: colubk_ = value; return true;
      case 0x0A: ctrlpf_ = value; dirty_ |= kDPF | kDBL; return true;
      case 0x0B: refp_[0] = value & 0x08; dirty_ |= kDP0; return true;
      case 0x0C: refp_[1] = value & 0x08; dirty_ |= kDP1; return true;
      case 0x0D: pf_[0] = value; dirty_ |= kDPF; return true;
      case 0x0E: pf_[1] = value; dirty_ |= kDPF; return true;
      case 0x0F: pf_[2] = value; dirty_ |= kDPF; return true;
      case 0x10: pos_p_[0] = strobe_pos(color_clock, 5); dirty_ |= kDP0; return true;
      case 0x11: pos_p_[1] = strobe_pos(color_clock, 5); dirty_ |= kDP1; return true;
      case 0x12: pos_m_[0] = strobe_pos(color_clock, 4); dirty_ |= kDM0; return true;
      case 0x13: pos_m_[1] = strobe_pos(color_clock, 4); dirty_ |= kDM1; return true;
      case 0x14: pos_bl_ = strobe_pos(color_clock, 4); dirty_ |= kDBL; return true;
      case 0x1B:
        grp_[0] = value;
        if (vdelp_[1]) grp_delayed_[1] = grp_buf_[1], grp_buf_[1] = grp_[1];
        dirty_ |= kDP0 | kDP1;
        return true;
      case 0x1C:
        grp_[1] = value;
        if (vdelp_[0]) grp_delayed_[0] = grp_buf_[0], grp_buf_[0] = grp_[0];
        dirty_ |= kDP0 | kDP1;
        return true;
      case 0x1D: enam_[0] = value & 0x02; dirty_ |= kDM0; return true;
      case 0x1E: enam_[1] = value & 0x02; dirty_ |= kDM1; return true;
      case 0x1F: enabl_ = value & 0x02; dirty_ |= kDBL; return true;
      case 0x20: hm_p_[0] = (int8_t)value >> 4; return true;
      case 0x21: hm_p_[1] = (int8_t)value >> 4; return true;
      case 0x22: hm_m_[0] = (int8_t)value >> 4; return true;
      case 0x23: hm_m_[1] = (int8_t)value >> 4; return true;
      case 0x24: hm_bl_ = (int8_t)value >> 4; return true;
      case 0x25: vdelp_[0] = value & 1; dirty_ |= kDP0; return true;
      case 0x26: vdelp_[1] = value & 1; dirty_ |= kDP1; return true;
      case 0x2A:  // HMOVE: apply motion
        pos_p_[0] = wrap(pos_p_[0] - hm_p_[0]);
        pos_p_[1] = wrap(pos_p_[1] - hm_p_[1]);
        pos_m_[0] = wrap(pos_m_[0] - hm_m_[0]);
        pos_m_[1] = wrap(pos_m_[1] - hm_m_[1]);
        pos_bl_ = wrap(pos_bl_ - hm_bl_);
        dirty_ |= kDP0 | kDP1 | kDM0 | kDM1 | kDBL;
        return true;
      case 0x2B: hm_p_[0] = hm_p_[1] = hm_m_[0] = hm_m_[1] = hm_bl_ = 0; return true;  // HMCLR
      case 0x2C: cx_ = 0; return true;  // CXCLR
      default: return false;
    }
  }

  // Collision registers (reads at 0x00-0x07): bit7/bit6 layout per TIA.
  uint8_t read_collision(uint8_t reg) const {
    auto b = [&](int bit) { return (cx_ >> bit) & 1; };
    switch (reg & 0x07) {
      case 0x0: return (b(0) << 7) | (b(1) << 6);  // CXM0P: M0-P1, M0-P0
      case 0x1: return (b(2) << 7) | (b(3) << 6);  // CXM1P
      case 0x2: return (b(4) << 7) | (b(5) << 6);  // CXP0FB: P0-PF, P0-BL
      case 0x3: return (b(6) << 7) | (b(7) << 6);  // CXP1FB
      case 0x4: return (b(8) << 7) | (b(9) << 6);  // CXM0FB
      case 0x5: return (b(10) << 7) | (b(11) << 6);  // CXM1FB
      case 0x6: return b(12) << 7;                  // CXBLPF
      case 0x7: return (b(13) << 7) | (b(14) << 6);  // CXPPMM: P0-P1, M0-M1
    }
    return 0;
  }

  // Called by the machine at the end of every scanline.
  void end_scanline() {
    render_to(228);
    if (!vblank_ && !vsync_ && (int)frame_lines_.size() < kMaxLines) {
      frame_lines_.emplace_back(line_, line_ + kVisible);
    }
    std::memset(line_, colubk_ >> 1, sizeof(line_));
    rendered_ = 0;
  }

  // Last completed frame: height x 160 color-index bytes.
  const std::vector<std::vector<uint8_t>>& frame() const { return last_frame_; }
  uint64_t frames_completed = 0;

 private:
  static int wrap(int p) { return ((p % kVisible) + kVisible) % kVisible; }

  int strobe_pos(int color_clock, int offset) {
    int x = color_clock - kHBlank + offset;
    return x < 0 ? 2 : wrap(x);
  }

  void end_frame() {
    if (!frame_lines_.empty()) {
      last_frame_ = frame_lines_;
      ++frames_completed;
    }
    frame_lines_.clear();
  }

  bool pf_bit(int x) const {
    // 20 playfield dots of 4 px; right half repeats or reflects.
    int dot = x / 4;
    if (dot >= 20) {
      dot -= 20;
      if (ctrlpf_ & 0x01) dot = 19 - dot;  // reflect
    }
    if (dot < 4) return (pf_[0] >> (4 + dot)) & 1;           // PF0: bits 4-7, LSB first
    if (dot < 12) return (pf_[1] >> (11 - dot)) & 1;         // PF1: MSB first
    return (pf_[2] >> (dot - 12)) & 1;                       // PF2: LSB first
  }

  bool player_bit(int i, int x) const {
    uint8_t g = vdelp_[i] ? grp_delayed_[i] : grp_[i];
    if (!g) return false;
    // copies/stretch per NUSIZ (copies only; stretch approximated)
    static const int kCopies[8][3] = {
        {0, -1, -1}, {0, 16, -1}, {0, 32, -1}, {0, 16, 32},
        {0, 64, -1}, {0, -1, -1}, {0, 32, 64}, {0, -1, -1},
    };
    int size = (nusiz_[i] & 7) == 5 ? 2 : ((nusiz_[i] & 7) == 7 ? 4 : 1);
    for (int c = 0; c < 3; ++c) {
      int off = kCopies[nusiz_[i] & 7][c];
      if (off < 0) continue;
      int rel = x - wrap(pos_p_[i] + off);
      if (rel < 0) rel += kVisible;
      if (rel >= 0 && rel < 8 * size) {
        int bit = rel / size;
        if (refp_[i]) bit = 7 - bit;
        if ((g >> (7 - bit)) & 1) return true;
      }
    }
    return false;
  }

  bool missile_bit(int i, int x) const {
    if (!enam_[i]) return false;
    int size = 1 << ((nusiz_[i] >> 4) & 3);
    int rel = x - pos_m_[i];
    if (rel < 0) rel += kVisible;
    return rel >= 0 && rel < size;
  }

  bool ball_bit(int x) const {
    if (!enabl_) return false;
    int size = 1 << ((ctrlpf_ >> 4) & 3);
    int rel = x - pos_bl_;
    if (rel < 0) rel += kVisible;
    return rel >= 0 && rel < size;
  }

  // ---- object scanline masks (160 bits as 3x uint64) -------------------
  struct M160 {
    uint64_t w[3] = {0, 0, 0};
    void clr() { w[0] = w[1] = w[2] = 0; }
    void set(int x) { w[x >> 6] |= 1ull << (x & 63); }
    bool test(int x) const { return (w[x >> 6] >> (x & 63)) & 1; }
  };

  static constexpr uint8_t kDPF = 1, kDP0 = 2, kDP1 = 4, kDM0 = 8,
                           kDM1 = 16, kDBL = 32;

 public:
  // Exposed for the equivalence test (tests vs the predicate oracle).
  void rebuild_masks_for_test() { rebuild_masks(); }
  bool mask_pf(int x) { return pf_mask_.test(x); }
  bool mask_player(int i, int x) { return p_mask_[i].test(x); }
  bool mask_missile(int i, int x) { return m_mask_[i].test(x); }
  bool mask_ball(int x) { return bl_mask_.test(x); }
  bool oracle_pf(int x) const { return pf_bit(x); }
  bool oracle_player(int i, int x) const { return player_bit(i, x); }
  bool oracle_missile(int i, int x) const { return missile_bit(i, x); }
  bool oracle_ball(int x) const { return ball_bit(x); }

 private:
  void rebuild_masks() {
    if (dirty_ & kDPF) {
      pf_mask_.clr();
      for (int dot = 0; dot < 20; ++dot) {
        bool bit = dot < 4   ? (pf_[0] >> (4 + dot)) & 1
                   : dot < 12 ? (pf_[1] >> (11 - dot)) & 1
                              : (pf_[2] >> (dot - 12)) & 1;
        if (!bit) continue;
        int l = dot * 4;
        pf_mask_.w[l >> 6] |= 0xFull << (l & 63);  // 4-aligned: no word split
        int rdot = (ctrlpf_ & 0x01) ? 19 - dot : dot;
        int r = 80 + rdot * 4;
        pf_mask_.w[r >> 6] |= 0xFull << (r & 63);
      }
    }
    for (int i = 0; i < 2; ++i) {
      if (dirty_ & (i ? kDP1 : kDP0)) {
        M160& m = p_mask_[i];
        m.clr();
        uint8_t g = vdelp_[i] ? grp_delayed_[i] : grp_[i];
        if (g) {
          static const int kCopies[8][3] = {
              {0, -1, -1}, {0, 16, -1}, {0, 32, -1}, {0, 16, 32},
              {0, 64, -1}, {0, -1, -1}, {0, 32, 64}, {0, -1, -1},
          };
          int n = nusiz_[i] & 7;
          int size = n == 5 ? 2 : (n == 7 ? 4 : 1);
          for (int c = 0; c < 3; ++c) {
            int off = kCopies[n][c];
            if (off < 0) continue;
            int base = wrap(pos_p_[i] + off);
            for (int rel = 0; rel < 8 * size; ++rel) {
              int bit = rel / size;
              if (refp_[i]) bit = 7 - bit;
              if ((g >> (7 - bit)) & 1) m.set((base + rel) % kVisible);
            }
          }
        }
      }
      if (dirty_ & (i ? kDM1 : kDM0)) {
        M160& m = m_mask_[i];
        m.clr();
        if (enam_[i]) {
          int size = 1 << ((nusiz_[i] >> 4) & 3);
          for (int r = 0; r < size; ++r) m.set((pos_m_[i] + r) % kVisible);
        }
      }
    }
    if (dirty_ & kDBL) {
      bl_mask_.clr();
      if (enabl_) {
        int size = 1 << ((ctrlpf_ >> 4) & 3);
        for (int r = 0; r < size; ++r) bl_mask_.set((pos_bl_ + r) % kVisible);
      }
    }
    dirty_ = 0;
  }

  void render_to(int color_clock) {
    int upto = color_clock - kHBlank;
    if (upto > kVisible) upto = kVisible;
    if (upto <= rendered_) return;
    if (dirty_) rebuild_masks();

    uint64_t seg[3];
    for (int wi = 0; wi < 3; ++wi) {
      int lo = rendered_ - wi * 64, hi = upto - wi * 64;
      if (hi <= 0 || lo >= 64) { seg[wi] = 0; continue; }
      uint64_t m = ~0ull;
      if (lo > 0) m &= ~0ull << lo;
      if (hi < 64) m &= (1ull << hi) - 1;
      seg[wi] = m;
    }

    const M160 &pf = pf_mask_, &p0 = p_mask_[0], &p1 = p_mask_[1],
               &m0 = m_mask_[0], &m1 = m_mask_[1], &bl = bl_mask_;
    auto hit = [&](const M160& a, const M160& b) -> bool {
      return ((a.w[0] & b.w[0] & seg[0]) | (a.w[1] & b.w[1] & seg[1]) |
              (a.w[2] & b.w[2] & seg[2])) != 0;
    };
    // collision latches: word-level, identical pairs/bits to the per-pixel
    // reference (see oracle predicates above)
    if (hit(m0, p1)) cx_ |= 1 << 0;
    if (hit(m0, p0)) cx_ |= 1 << 1;
    if (hit(m1, p0)) cx_ |= 1 << 2;
    if (hit(m1, p1)) cx_ |= 1 << 3;
    if (hit(p0, pf)) cx_ |= 1 << 4;
    if (hit(p0, bl)) cx_ |= 1 << 5;
    if (hit(p1, pf)) cx_ |= 1 << 6;
    if (hit(p1, bl)) cx_ |= 1 << 7;
    if (hit(m0, pf)) cx_ |= 1 << 8;
    if (hit(m0, bl)) cx_ |= 1 << 9;
    if (hit(m1, pf)) cx_ |= 1 << 10;
    if (hit(m1, bl)) cx_ |= 1 << 11;
    if (hit(bl, pf)) cx_ |= 1 << 12;
    if (hit(p0, p1)) cx_ |= 1 << 13;
    if (hit(m0, m1)) cx_ |= 1 << 14;

    // background fill, then sparse overlay of object pixels with the same
    // priority logic as the per-pixel reference renderer
    std::memset(line_ + rendered_, colubk_ >> 1, upto - rendered_);
    const bool pf_priority = ctrlpf_ & 0x04;
    const bool score = (ctrlpf_ & 0x02) && !pf_priority;
    for (int wi = 0; wi < 3; ++wi) {
      uint64_t bits =
          (pf.w[wi] | p0.w[wi] | p1.w[wi] | m0.w[wi] | m1.w[wi] | bl.w[wi]) &
          seg[wi];
      while (bits) {
        int b = __builtin_ctzll(bits);
        bits &= bits - 1;
        int x = wi * 64 + b;
        bool fpf = pf.test(x) || bl.test(x);
        uint8_t color;
        if (pf_priority && fpf) color = colupf_;
        else if (p0.test(x) || m0.test(x)) color = colup_[0];
        else if (p1.test(x) || m1.test(x)) color = colup_[1];
        else if (fpf) color = score ? (x < 80 ? colup_[0] : colup_[1]) : colupf_;
        else color = colubk_;
        line_[x] = color >> 1;  // 7-bit color index
      }
    }
    rendered_ = upto;
  }

  // registers
  bool vsync_ = false, vblank_ = false;
  uint8_t nusiz_[2] = {0, 0};
  uint8_t colup_[2] = {0, 0}, colupf_ = 0, colubk_ = 0, ctrlpf_ = 0;
  bool refp_[2] = {false, false};
  uint8_t pf_[3] = {0, 0, 0};
  uint8_t grp_[2] = {0, 0}, grp_buf_[2] = {0, 0}, grp_delayed_[2] = {0, 0};
  bool vdelp_[2] = {false, false};
  bool enam_[2] = {false, false}, enabl_ = false;
  int pos_p_[2] = {0, 0}, pos_m_[2] = {0, 0}, pos_bl_ = 0;
  int hm_p_[2] = {0, 0}, hm_m_[2] = {0, 0}, hm_bl_ = 0;
  uint16_t cx_ = 0;

  // object masks (lazily rebuilt; see rebuild_masks)
  M160 pf_mask_, p_mask_[2], m_mask_[2], bl_mask_;
  uint8_t dirty_ = kDPF | kDP0 | kDP1 | kDM0 | kDM1 | kDBL;

  // beam state
  uint8_t line_[kVisible] = {0};
  int rendered_ = 0;
  std::vector<std::vector<uint8_t>> frame_lines_;
  std::vector<std::vector<uint8_t>> last_frame_;
};

}  // namespace mmtrl
