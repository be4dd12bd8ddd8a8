// TIA video — functional catch-up renderer.
//
// Renders each scanline incrementally: every TIA register write first
// draws the beam up to the current color clock with the OLD state, then
// applies the write — so mid-line "racing the beam" updates (playfield
// rewrites per row, sprite repositioning) land at instruction granularity.
// Not cycle-exact (no HMOVE comb, no exact strobe latencies beyond the
// standard +5 offset), but sufficient to rasterize real cartridges'
// playfields and sprites and to latch the collision bits game logic reads.
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
      case 0x04: nusiz_[0] = value; return true;
      case 0x05: nusiz_[1] = value; return true;
      case 0x06: colup_[0] = value; return true;
      case 0x07: colup_[1] = value; return true;
      case 0x08: colupf_ = value; return true;
      case 0x09: colubk_ = value; return true;
      case 0x0A: ctrlpf_ = value; return true;
      case 0x0B: refp_[0] = value & 0x08; return true;
      case 0x0C: refp_[1] = value & 0x08; return true;
      case 0x0D: pf_[0] = value; return true;
      case 0x0E: pf_[1] = value; return true;
      case 0x0F: pf_[2] = value; return true;
      case 0x10: pos_p_[0] = strobe_pos(color_clock, 5); return true;
      case 0x11: pos_p_[1] = strobe_pos(color_clock, 5); return true;
      case 0x12: pos_m_[0] = strobe_pos(color_clock, 4); return true;
      case 0x13: pos_m_[1] = strobe_pos(color_clock, 4); return true;
      case 0x14: pos_bl_ = strobe_pos(color_clock, 4); return true;
      case 0x1B:
        grp_[0] = value;
        if (vdelp_[1]) grp_delayed_[1] = grp_buf_[1], grp_buf_[1] = grp_[1];
        return true;
      case 0x1C:
        grp_[1] = value;
        if (vdelp_[0]) grp_delayed_[0] = grp_buf_[0], grp_buf_[0] = grp_[0];
        return true;
      case 0x1D: enam_[0] = value & 0x02; return true;
      case 0x1E: enam_[1] = value & 0x02; return true;
      case 0x1F: enabl_ = value & 0x02; return true;
      case 0x20: hm_p_[0] = (int8_t)value >> 4; return true;
      case 0x21: hm_p_[1] = (int8_t)value >> 4; return true;
      case 0x22: hm_m_[0] = (int8_t)value >> 4; return true;
      case 0x23: hm_m_[1] = (int8_t)value >> 4; return true;
      case 0x24: hm_bl_ = (int8_t)value >> 4; return true;
      case 0x25: vdelp_[0] = value & 1; return true;
      case 0x26: vdelp_[1] = value & 1; return true;
      case 0x2A:  // HMOVE: apply motion
        pos_p_[0] = wrap(pos_p_[0] - hm_p_[0]);
        pos_p_[1] = wrap(pos_p_[1] - hm_p_[1]);
        pos_m_[0] = wrap(pos_m_[0] - hm_m_[0]);
        pos_m_[1] = wrap(pos_m_[1] - hm_m_[1]);
        pos_bl_ = wrap(pos_bl_ - hm_bl_);
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

  void render_to(int color_clock) {
    int upto = color_clock - kHBlank;
    if (upto > kVisible) upto = kVisible;
    for (int x = rendered_; x < upto; ++x) {
      bool pf = pf_bit(x);
      bool p0 = player_bit(0, x);
      bool p1 = player_bit(1, x);
      bool m0 = missile_bit(0, x);
      bool m1 = missile_bit(1, x);
      bool bl = ball_bit(x);
      // collisions
      if (m0 && p1) cx_ |= 1 << 0;
      if (m0 && p0) cx_ |= 1 << 1;
      if (m1 && p0) cx_ |= 1 << 2;
      if (m1 && p1) cx_ |= 1 << 3;
      if (p0 && pf) cx_ |= 1 << 4;
      if (p0 && bl) cx_ |= 1 << 5;
      if (p1 && pf) cx_ |= 1 << 6;
      if (p1 && bl) cx_ |= 1 << 7;
      if (m0 && pf) cx_ |= 1 << 8;
      if (m0 && bl) cx_ |= 1 << 9;
      if (m1 && pf) cx_ |= 1 << 10;
      if (m1 && bl) cx_ |= 1 << 11;
      if (bl && pf) cx_ |= 1 << 12;
      if (p0 && p1) cx_ |= 1 << 13;
      if (m0 && m1) cx_ |= 1 << 14;
      // priority: players/missiles above playfield unless CTRLPF bit2
      uint8_t color = colubk_;
      bool pf_priority = ctrlpf_ & 0x04;
      if (pf_priority && (pf || bl)) color = colupf_;
      else if (p0 || m0) color = colup_[0];
      else if (p1 || m1) color = colup_[1];
      else if (pf || bl) {
        // score mode: left half uses COLUP0, right half COLUP1
        if ((ctrlpf_ & 0x02) && !(ctrlpf_ & 0x04))
          color = x < 80 ? colup_[0] : colup_[1];
        else color = colupf_;
      }
      if (!pf_priority && !(p0 || m0 || p1 || m1) && !(pf || bl)) color = colubk_;
      if (pf_priority && !(pf || bl)) {
        if (p0 || m0) color = colup_[0];
        else if (p1 || m1) color = colup_[1];
      }
      line_[x] = color >> 1;  // 7-bit color index
    }
    if (upto > rendered_) rendered_ = upto;
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

  // beam state
  uint8_t line_[kVisible] = {0};
  int rendered_ = 0;
  std::vector<std::vector<uint8_t>> frame_lines_;
  std::vector<std::vector<uint8_t>> last_frame_;
};

}  // namespace mmtrl
