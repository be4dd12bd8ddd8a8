// Generic RL adapter for in-repo homebrew 2600 cartridges.
//
// Where skel_env.cc reverse-engineers the reference cartridge's RAM
// (display-glyph pointers, end screens), homebrew carts we author follow a
// documented RL ABI, so ONE adapter serves every such game:
//
//   $80 (RIOT ram[0x00])  SCORE   binary, event-incremented, may wrap
//   $81 (RIOT ram[0x01])  LIVES   remaining lives
//   $82 (RIOT ram[0x02])  STATUS  0 playing / 1 game over / 2 win
//
// Reward components returned per step are ALE-style deltas: score_delta
// (wrap-aware) and life_delta (<= 0).  Episodes end on STATUS != 0 or the
// frame cap; auto-reset follows the EnvPool convention (the obs returned
// with done=1 is the first obs of the fresh episode).
//
// Input protocol: actions are HELD for the whole frameskip window
// (level-triggered — homebrew game loops poll SWCHA every frame), unlike
// the SkelPlus pulse protocol.  Action set (ALE-minimal style):
//   0 NOOP, 1 LEFT, 2 RIGHT, 3 UP, 4 DOWN, 5 FIRE.
//
// First cartridge: native/homebrew/rally.asm (see its header for the
// game + multimodal-audio design).

#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <thread>
#include <vector>

#include "env_common.h"

namespace {

using mmtrl::Machine2600;
using namespace mmtrl::envcommon;

constexpr int kNumActions = 6;
constexpr int kScoreAddr = 0x00;  // $80
constexpr int kLivesAddr = 0x01;  // $81
constexpr int kStatusAddr = 0x02; // $82

struct AbiEnv {
  Machine2600* m = nullptr;
  std::vector<uint8_t> rom;
  size_t audio_cursor = 0;
  uint64_t rng;
  int score = 0, lives = 0;
  int frames_in_episode = 0;

  ~AbiEnv() { delete m; }

  void reset() {
    delete m;
    m = boot_machine(rom, &rng);
    audio_cursor = m->audio_left().size();
    score = m->riot().ram[kScoreAddr];
    lives = m->riot().ram[kLivesAddr];
    frames_in_episode = 0;
  }
};

struct AbiPool {
  std::vector<AbiEnv*> envs;
  int frameskip = 8;
  int episode_frame_cap = 0;
  ~AbiPool() {
    for (auto* e : envs) delete e;
  }
};

std::mutex g_mutex;
std::map<int64_t, AbiPool*> g_pools;
int64_t g_next = 1;

uint8_t action_bits(int32_t a) {
  switch (a) {
    case 1: return 0x04;  // LEFT
    case 2: return 0x08;  // RIGHT
    case 3: return 0x01;  // UP
    case 4: return 0x02;  // DOWN
    case 5: return 0x10;  // FIRE
    default: return 0x00;
  }
}

void step_one(AbiPool* pool, AbiEnv* e, int32_t action, uint8_t* frame_out,
              float* audio_out, int32_t* score_delta, int32_t* life_delta,
              uint8_t* done, uint8_t* win, int32_t* score_abs,
              int32_t* lives_abs) {
  const int fs = pool->frameskip;
  uint8_t bits = action_bits(action);
  std::vector<uint8_t> prev(kFrameW * kFrameH, 0);
  apply_input(e->m, bits);  // held for the whole window
  for (int f = 0; f < fs; ++f) {
    if (f == fs - 2) {
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

  const int want = kSamplesPerFrame * fs;
  drain_audio(e->m, &e->audio_cursor, want, audio_out);

  const uint8_t* ram = e->m->riot().ram;
  int new_score = ram[kScoreAddr];
  int new_lives = ram[kLivesAddr];
  int status = ram[kStatusAddr];
  e->frames_in_episode += fs;
  bool capped = pool->episode_frame_cap > 0 &&
                e->frames_in_episode >= pool->episode_frame_cap;

  *score_delta = (new_score - e->score) & 0xFF;  // wrap-aware uint8 delta
  if (*score_delta > 128) *score_delta = 0;      // reset glitch guard
  *life_delta = new_lives < e->lives ? new_lives - e->lives : 0;
  *done = (status != 0 || capped) ? 1 : 0;
  *win = status == 2 ? 1 : 0;
  e->score = new_score;
  e->lives = new_lives;
  *score_abs = e->score;
  *lives_abs = e->lives;
  if (*done) {
    e->reset();
    std::memset(frame_out, 0, kFrameW * kFrameH);
    std::vector<uint8_t> zero(kFrameW * kFrameH, 0);
    copy_frame_max(e->m, zero.data(), frame_out);
    std::memset(audio_out, 0, sizeof(float) * 2 * want);
    e->audio_cursor = e->m->audio_left().size();
  }
}

// Two-player step: the cartridge follows the 2P RL ABI ($80 SCORE0 /
// $81 SCORE1 / $82 STATUS — native/homebrew/pong.asm).  Both players'
// actions are held for the frameskip window; outputs are per-player
// wrap-aware score deltas (zero-sum rewards are composed Python-side).
void step2_one(AbiPool* pool, AbiEnv* e, int32_t a0, int32_t a1,
               uint8_t* frame_out, float* audio_out, int32_t* sd0,
               int32_t* sd1, uint8_t* done, uint8_t* win, int32_t* s0_abs,
               int32_t* s1_abs) {
  const int fs = pool->frameskip;
  std::vector<uint8_t> prev(kFrameW * kFrameH, 0);
  apply_input2(e->m, action_bits(a0), action_bits(a1));
  for (int f = 0; f < fs; ++f) {
    if (f == fs - 2) {
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

  const int want = kSamplesPerFrame * fs;
  drain_audio(e->m, &e->audio_cursor, want, audio_out);

  const uint8_t* ram = e->m->riot().ram;
  int new_s0 = ram[kScoreAddr];        // $80 SCORE0
  int new_s1 = ram[kLivesAddr];        // $81 SCORE1 (2P ABI reuse)
  int status = ram[kStatusAddr];
  e->frames_in_episode += fs;
  bool capped = pool->episode_frame_cap > 0 &&
                e->frames_in_episode >= pool->episode_frame_cap;

  *sd0 = (new_s0 - e->score) & 0xFF;
  if (*sd0 > 128) *sd0 = 0;
  *sd1 = (new_s1 - e->lives) & 0xFF;  // `lives` doubles as prev SCORE1
  if (*sd1 > 128) *sd1 = 0;
  *done = (status != 0 || capped) ? 1 : 0;
  *win = 0;
  e->score = new_s0;
  e->lives = new_s1;
  *s0_abs = e->score;
  *s1_abs = e->lives;
  if (*done) {
    e->reset();
    std::memset(frame_out, 0, kFrameW * kFrameH);
    std::vector<uint8_t> zero(kFrameW * kFrameH, 0);
    copy_frame_max(e->m, zero.data(), frame_out);
    std::memset(audio_out, 0, sizeof(float) * 2 * want);
    e->audio_cursor = e->m->audio_left().size();
  }
}

}  // namespace

extern "C" {

int64_t mmtrl_abi_make(const char* rom_path, int32_t num_envs, uint64_t seed,
                       int32_t frameskip, int32_t episode_frame_cap) {
  std::vector<uint8_t> rom;
  if (!read_rom_file(rom_path, &rom)) return -1;

  auto* pool = new AbiPool();
  pool->frameskip = frameskip < 2 ? 2 : frameskip;
  pool->episode_frame_cap = episode_frame_cap;
  for (int i = 0; i < num_envs; ++i) {
    auto* e = new AbiEnv();
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

int32_t mmtrl_abi_shape(int64_t handle, int32_t* h, int32_t* w,
                        int32_t* audio_len, int32_t* num_actions) {
  AbiPool* pool;
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

void mmtrl_abi_reset(int64_t handle, uint8_t* frames, float* audio) {
  AbiPool* pool;
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

void mmtrl_abi_step(int64_t handle, const int32_t* actions, uint8_t* frames,
                    float* audio, int32_t* score_delta, int32_t* life_delta,
                    uint8_t* done, uint8_t* win, int32_t* score,
                    int32_t* lives) {
  AbiPool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  const int n = (int)pool->envs.size();
  const int want = kSamplesPerFrame * pool->frameskip;
  auto work = [&](int i) {
    step_one(pool, pool->envs[i], actions[i],
             frames + (size_t)i * kFrameW * kFrameH,
             audio + (size_t)i * 2 * want, score_delta + i, life_delta + i,
             done + i, win + i, score + i, lives + i);
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

void mmtrl_abi_ram(int64_t handle, uint8_t* out) {
  AbiPool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  for (size_t i = 0; i < pool->envs.size(); ++i)
    std::memcpy(out + i * 128, pool->envs[i]->m->riot().ram, 128);
}

void mmtrl_abi_close(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_pools.find(handle);
  if (it != g_pools.end()) {
    delete it->second;
    g_pools.erase(it);
  }
}


// ---- two-player API (mmtrl_abi2): same signatures as the 1P family, so
// the Python binder (envs/skeleton_native.py load_native) binds it by
// prefix.  `actions` is (num_envs, 2) row-major; the score_delta /
// life_delta output slots carry per-player score deltas, and the score /
// lives slots the absolute per-player scores.

int64_t mmtrl_abi2_make(const char* rom_path, int32_t num_envs,
                        uint64_t seed, int32_t frameskip,
                        int32_t episode_frame_cap) {
  return mmtrl_abi_make(rom_path, num_envs, seed, frameskip,
                        episode_frame_cap);
}

int32_t mmtrl_abi2_shape(int64_t handle, int32_t* h, int32_t* w,
                         int32_t* audio_len, int32_t* num_actions) {
  return mmtrl_abi_shape(handle, h, w, audio_len, num_actions);
}

void mmtrl_abi2_reset(int64_t handle, uint8_t* frames, float* audio) {
  mmtrl_abi_reset(handle, frames, audio);
}

void mmtrl_abi2_step(int64_t handle, const int32_t* actions, uint8_t* frames,
                     float* audio, int32_t* sd0, int32_t* sd1, uint8_t* done,
                     uint8_t* win, int32_t* score0, int32_t* score1) {
  AbiPool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  const int n = (int)pool->envs.size();
  const int want = kSamplesPerFrame * pool->frameskip;
  auto work = [&](int i) {
    step2_one(pool, pool->envs[i], actions[2 * i], actions[2 * i + 1],
              frames + (size_t)i * kFrameW * kFrameH,
              audio + (size_t)i * 2 * want, sd0 + i, sd1 + i, done + i,
              win + i, score0 + i, score1 + i);
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

void mmtrl_abi2_ram(int64_t handle, uint8_t* out) { mmtrl_abi_ram(handle, out); }

void mmtrl_abi2_close(int64_t handle) { mmtrl_abi_close(handle); }

}  // extern "C"
