// Batched 2600 stepper with the EnvPool-style C ABI (like
// envpool/gridworld.cc): N machines stepped one frame per call across a
// thread pool, returning fixed-shape (frame, stereo-audio-window) tensors
// for the io_callback bridge.  Reward/termination extraction is
// game-specific RAM reading (the ALE approach) and lands with per-game
// adapters; this layer delivers the raw multimodal observation stream.
//
//   mmtrl_atari_make(rom_path, num_envs, seed) -> handle
//   mmtrl_atari_step(handle, actions[n], frames[n*160*H], audio[n*2*S])
//   mmtrl_atari_close(handle)
//
// Actions (joystick + console): bit0 up, bit1 down, bit2 left, bit3 right,
// bit4 fire, bit5 console-reset.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <thread>
#include <vector>

#include "machine2600.h"

namespace {

constexpr int kFrameH = 192;  // fixed visible-line window
constexpr int kFrameW = 160;
constexpr int kAudioPerFrame = 2 * 262;  // samples per channel per frame

struct AtariPool {
  std::vector<mmtrl::Machine2600*> machines;
  std::vector<size_t> audio_cursor;

  ~AtariPool() {
    for (auto* m : machines) delete m;
  }
};

std::mutex g_mutex;
std::map<int64_t, AtariPool*> g_pools;
int64_t g_next = 1;

void step_one(mmtrl::Machine2600* m, size_t* audio_cursor, uint8_t action,
              uint8_t* frame_out, float* audio_out) {
  // Map action bits to SWCHA (active low: P0 in the high nibble) + SWCHB.
  uint8_t swcha = 0xFF;
  if (action & 0x01) swcha &= ~0x10;  // up
  if (action & 0x02) swcha &= ~0x20;  // down
  if (action & 0x04) swcha &= ~0x40;  // left
  if (action & 0x08) swcha &= ~0x80;  // right
  m->riot().swcha = swcha;
  m->riot().swchb = (action & 0x20) ? 0x0A : 0x0B;  // console reset
  m->fire[0] = (action & 0x10) != 0;                // INPT4 fire button
  m->run_frames(1);

  const auto& fr = m->video().frame();
  std::memset(frame_out, 0, kFrameW * kFrameH);
  int h = (int)fr.size() < kFrameH ? (int)fr.size() : kFrameH;
  for (int y = 0; y < h; ++y)
    std::memcpy(frame_out + y * kFrameW, fr[y].data(), kFrameW);

  const auto& l = m->audio_left();
  const auto& r = m->audio_right();
  size_t start = *audio_cursor;
  for (int i = 0; i < kAudioPerFrame; ++i) {
    size_t idx = start + i;
    float lv = idx < l.size() ? l[idx] / 15.0f : 0.0f;
    float rv = idx < r.size() ? r[idx] / 15.0f : 0.0f;
    audio_out[i] = lv;
    audio_out[kAudioPerFrame + i] = rv;
  }
  m->consume_audio(l.size());
  *audio_cursor = 0;
}

}  // namespace

extern "C" {

int64_t mmtrl_atari_make(const char* rom_path, int32_t num_envs,
                         uint64_t seed) {
  FILE* f = std::fopen(rom_path, "rb");
  if (!f) return -1;
  std::vector<uint8_t> rom;
  int ch;
  while ((ch = std::fgetc(f)) != EOF) rom.push_back((uint8_t)ch);
  std::fclose(f);
  if (rom.empty() || (rom.size() & (rom.size() - 1)) != 0) return -1;

  auto* pool = new AtariPool();
  for (int i = 0; i < num_envs; ++i) {
    auto* m = new mmtrl::Machine2600(rom.data(), rom.size());
    // Desynchronize machines: run a seed-dependent number of warmup frames.
    int warmup = 2 + (int)((seed + i * 2654435761u) % 29);
    m->run_frames(warmup);
    pool->machines.push_back(m);
    pool->audio_cursor.push_back(m->audio_left().size());
  }
  std::lock_guard<std::mutex> lock(g_mutex);
  int64_t h = g_next++;
  g_pools[h] = pool;
  return h;
}

int32_t mmtrl_atari_frame_shape(int32_t* h, int32_t* w, int32_t* audio_len) {
  *h = kFrameH;
  *w = kFrameW;
  *audio_len = kAudioPerFrame;
  return 0;
}

void mmtrl_atari_step(int64_t handle, const uint8_t* actions,
                      uint8_t* frames, float* audio) {
  AtariPool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  const int n = (int)pool->machines.size();
  int workers = (int)std::min<size_t>(std::thread::hardware_concurrency(), 8);
  if (n < 4 || workers <= 1) {
    for (int i = 0; i < n; ++i)
      step_one(pool->machines[i], &pool->audio_cursor[i], actions[i],
               frames + (size_t)i * kFrameW * kFrameH,
               audio + (size_t)i * 2 * kAudioPerFrame);
    return;
  }
  std::vector<std::thread> ts;
  const int chunk = (n + workers - 1) / workers;
  for (int w = 0; w < workers; ++w) {
    int lo = w * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=, &pool]() {
      for (int i = lo; i < hi; ++i)
        step_one(pool->machines[i], &pool->audio_cursor[i], actions[i],
                 frames + (size_t)i * kFrameW * kFrameH,
                 audio + (size_t)i * 2 * kAudioPerFrame);
    });
  }
  for (auto& t : ts) t.join();
}

// Dump the 128-byte RIOT RAM of every machine (out: n*128). Game state
// lives here — reward/termination adapters and RAM reconnaissance both
// read it (the ALE per-game approach).
void mmtrl_atari_ram(int64_t handle, uint8_t* out) {
  AtariPool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  for (size_t i = 0; i < pool->machines.size(); ++i)
    std::memcpy(out + i * 128, pool->machines[i]->riot().ram, 128);
}

void mmtrl_atari_close(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_pools.find(handle);
  if (it != g_pools.end()) {
    delete it->second;
    g_pools.erase(it);
  }
}

}  // extern "C"
