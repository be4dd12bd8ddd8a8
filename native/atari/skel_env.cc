// Skeleton+ RL environment adapter: the ALE per-game approach (RAM-derived
// reward/termination + auto-reset) for the reference's benchmark ROM
// (reference: environments/skeleton_plus/SkelPlus.bin; ALE audio config
// Config.py:81-89).  The RAM map below was established by disassembling the
// 4K cartridge and verified by scripted play (tests/test_skeleton_native.py
// kills real skeletons through this adapter):
//
//   $AB  player position   (flat row*16+col on a 16x16 toroidal maze)
//   $AC  facing delta      (+1 E, +16 S, -1 W, -16 N; 8-bit wrap)
//   $AE  skeleton position
//   $98  visible corridor depth ahead (1 = wall in face)
//   $99  line-of-sight distance to skeleton (1..4, 0 = not visible);
//        shots land only when ($99 & 3) != 0   [ROM $F252]
//   $9C  Undead Disintegrator reload counter (0x3C=60 frames per shot)
//   $A4  hits remaining on current skeleton; $A5 skeleton number
//   $B2  maze bitmask (ASL per maze; 8 mazes then win)  [ROM $F480]
//   $B4/$B6  life display digit glyph pointers: digit d <-> 0x2F + 5*d
//        (life = 10*d($B4) + d($B6); game over sets both to 0x2F [$F71D])
//   $B8/$BA  kills display digit glyph pointers, same encoding [$F452]
//   end screens: $99=0x8C (game over) / $99=0xD8,$A2=0x73 (win), $A3=0x0E
//        [ROM $F6AF/$F6B5]
//   maze walls: ROM $1800+pos & $B2  [ROM $F0FB]
//
// Step protocol ("pulse" input): the ROM requires the joystick to return to
// center between moves and the fire button to be released between shots
// (SkelPlus.txt §3), so each env step presses the chosen input for 2 frames
// and releases it for frameskip-2 — one env step is at most one move/shot.
// Video is the pixelwise max of the last two frames; audio is the full
// frameskip window of TIA stereo samples (2 per scanline, ~31.44 kHz).

#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <thread>
#include <vector>

#include "env_common.h"

namespace {

using namespace mmtrl::envcommon;

// Zero-page addresses minus 0x80 (RIOT RAM offsets).
constexpr int kLifeTens = 0x34, kLifeOnes = 0x36;
constexpr int kKillTens = 0x38, kKillOnes = 0x3A;
constexpr int kEndScreenA = 0x19;   // $99
constexpr int kEndScreenB = 0x22;   // $A2
constexpr int kEndScreenC = 0x23;   // $A3

// Action set mirrors the device-resident simulator (envs/skeleton_plus.py):
// 0 FORWARD, 1 TURN_LEFT, 2 TURN_RIGHT, 3 FIRE, 4 NOOP.
constexpr int kNumActions = 5;

int decode_digit(uint8_t lo) {
  if (lo < 0x2F || lo > 0x5C || (lo - 0x2F) % 5 != 0) return -1;
  return (lo - 0x2F) / 5;
}

struct SkelEnv {
  mmtrl::Machine2600* m = nullptr;
  std::vector<uint8_t> rom;
  size_t audio_cursor = 0;
  uint64_t rng;
  int kills = 0, life = 99;
  int frames_in_episode = 0;

  ~SkelEnv() { delete m; }

  int read_counter(int tens, int ones, int fallback) const {
    int t = decode_digit(m->riot().ram[tens]);
    int o = decode_digit(m->riot().ram[ones]);
    if (t < 0 || o < 0) return fallback;
    return 10 * t + o;
  }

  bool game_over() const {
    return m->riot().ram[kLifeTens] == 0x2F && m->riot().ram[kLifeOnes] == 0x2F;
  }

  bool won() const {
    return m->riot().ram[kEndScreenA] == 0xD8 &&
           m->riot().ram[kEndScreenB] == 0x73 &&
           m->riot().ram[kEndScreenC] == 0x0E;
  }

  void reset() {
    // Fresh machine (the end screens trap the CPU in a loop that ignores
    // console switches until the player presses them; a cold boot plus the
    // RESET switch is the reliable path and matches ALE's reset_game()).
    delete m;
    m = boot_machine(rom, &rng);
    audio_cursor = m->audio_left().size();
    kills = read_counter(kKillTens, kKillOnes, 0);
    life = read_counter(kLifeTens, kLifeOnes, 99);
    frames_in_episode = 0;
  }
};

struct SkelPool {
  std::vector<SkelEnv*> envs;
  int frameskip = 8;
  int episode_frame_cap = 0;  // 0 = uncapped
  ~SkelPool() {
    for (auto* e : envs) delete e;
  }
};

std::mutex g_mutex;
std::map<int64_t, SkelPool*> g_pools;
int64_t g_next = 1;

uint8_t action_bits(int32_t a) {
  switch (a) {
    case 0: return 0x01;  // FORWARD = joystick up
    case 1: return 0x04;  // TURN_LEFT
    case 2: return 0x08;  // TURN_RIGHT
    case 3: return 0x10;  // FIRE
    default: return 0x00;
  }
}

void step_one(SkelPool* pool, SkelEnv* e, int32_t action, uint8_t* frame_out,
              float* audio_out, int32_t* kills_delta, int32_t* life_delta,
              uint8_t* done, uint8_t* win, int32_t* kills_abs,
              int32_t* life_abs) {
  const int fs = pool->frameskip;
  uint8_t bits = action_bits(action);
  std::vector<uint8_t> prev(kFrameW * kFrameH, 0);
  for (int f = 0; f < fs; ++f) {
    apply_input(e->m, f < 2 ? bits : 0x00);
    if (f == fs - 2) {
      // capture the second-to-last frame for the flicker max-pool
      e->m->run_frames(1);
      const auto& fr = e->m->video().frame();
      int h = (int)fr.size() < kFrameH ? (int)fr.size() : kFrameH;
      for (int y = 0; y < h; ++y)
        std::memcpy(prev.data() + y * kFrameW, fr[y].data(), kFrameW);
    } else {
      e->m->run_frames(1);
    }
  }
  std::memset(frame_out, 0, kFrameW * kFrameH);
  copy_frame_max(e->m, prev.data(), frame_out);

  // audio: last fs frames' worth of samples per channel
  const int want = kSamplesPerFrame * fs;
  drain_audio(e->m, &e->audio_cursor, want, audio_out);
  e->frames_in_episode += fs;

  int new_kills = e->read_counter(kKillTens, kKillOnes, e->kills);
  int new_life = e->read_counter(kLifeTens, kLifeOnes, e->life);
  bool over = e->game_over();
  bool victory = e->won();
  bool capped = pool->episode_frame_cap > 0 &&
                e->frames_in_episode >= pool->episode_frame_cap;
  *kills_delta = new_kills > e->kills ? new_kills - e->kills : 0;
  *life_delta = new_life < e->life ? new_life - e->life : 0;
  if (over) *life_delta = -e->life;  // death consumes the remaining life
  *done = (over || victory || capped) ? 1 : 0;
  *win = victory ? 1 : 0;
  e->kills = new_kills;
  e->life = over ? 0 : new_life;
  *kills_abs = e->kills;
  *life_abs = e->life;
  if (*done) {
    e->reset();
    // EnvPool convention: the obs returned with done=1 is the first obs of
    // the fresh episode.
    std::memset(frame_out, 0, kFrameW * kFrameH);
    std::vector<uint8_t> zero(kFrameW * kFrameH, 0);
    copy_frame_max(e->m, zero.data(), frame_out);
    std::memset(audio_out, 0, sizeof(float) * 2 * want);
    e->audio_cursor = e->m->audio_left().size();
  }
}

}  // namespace

extern "C" {

int64_t mmtrl_skel_make(const char* rom_path, int32_t num_envs, uint64_t seed,
                        int32_t frameskip, int32_t episode_frame_cap) {
  std::vector<uint8_t> rom;
  if (!read_rom_file(rom_path, &rom)) return -1;

  auto* pool = new SkelPool();
  pool->frameskip = frameskip < 3 ? 3 : frameskip;
  pool->episode_frame_cap = episode_frame_cap;
  for (int i = 0; i < num_envs; ++i) {
    auto* e = new SkelEnv();
    e->rom = rom;
    e->rng = seed * 0x9E3779B97F4A7C15ull + i + 1;
    e->reset();
    pool->envs.push_back(e);
  }
  std::lock_guard<std::mutex> lock(g_mutex);
  int64_t h = g_next++;
  g_pools[h] = pool;
  return h;
}

int32_t mmtrl_skel_shape(int64_t handle, int32_t* h, int32_t* w,
                         int32_t* audio_len, int32_t* num_actions) {
  SkelPool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto it = g_pools.find(handle);
    if (it == g_pools.end()) return -1;
    pool = it->second;
  }
  *h = kFrameH;
  *w = kFrameW;
  *audio_len = kSamplesPerFrame * pool->frameskip;
  *num_actions = kNumActions;
  return 0;
}

// Force-reset every machine; fills the initial observation.
void mmtrl_skel_reset(int64_t handle, uint8_t* frames, float* audio) {
  SkelPool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  const int want = kSamplesPerFrame * pool->frameskip;
  for (size_t i = 0; i < pool->envs.size(); ++i) {
    auto* e = pool->envs[i];
    e->reset();
    uint8_t* fout = frames + i * kFrameW * kFrameH;
    std::memset(fout, 0, kFrameW * kFrameH);
    std::vector<uint8_t> zero(kFrameW * kFrameH, 0);
    copy_frame_max(e->m, zero.data(), fout);
    std::memset(audio + i * 2 * want, 0, sizeof(float) * 2 * want);
  }
}

void mmtrl_skel_step(int64_t handle, const int32_t* actions, uint8_t* frames,
                     float* audio, int32_t* kills_delta, int32_t* life_delta,
                     uint8_t* done, uint8_t* win, int32_t* kills,
                     int32_t* life) {
  SkelPool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  const int n = (int)pool->envs.size();
  const int want = kSamplesPerFrame * pool->frameskip;
  auto work = [&](int i) {
    step_one(pool, pool->envs[i], actions[i],
             frames + (size_t)i * kFrameW * kFrameH,
             audio + (size_t)i * 2 * want, kills_delta + i, life_delta + i,
             done + i, win + i, kills + i, life + i);
  };
  int workers = (int)std::min<size_t>(std::thread::hardware_concurrency(), 8);
  if (n < 4 || workers <= 1) {
    for (int i = 0; i < n; ++i) work(i);
    return;
  }
  std::vector<std::thread> ts;
  const int chunk = (n + workers - 1) / workers;
  for (int w = 0; w < workers; ++w) {
    int lo = w * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=]() {
      for (int i = lo; i < hi; ++i) work(i);
    });
  }
  for (auto& t : ts) t.join();
}

// RAM dump for tests/diagnostics (n*128 bytes).
void mmtrl_skel_ram(int64_t handle, uint8_t* out) {
  SkelPool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  for (size_t i = 0; i < pool->envs.size(); ++i)
    std::memcpy(out + i * 128, pool->envs[i]->m->riot().ram, 128);
}

void mmtrl_skel_close(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_pools.find(handle);
  if (it != g_pools.end()) {
    delete it->second;
    g_pools.erase(it);
  }
}

}  // extern "C"
