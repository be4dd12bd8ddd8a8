// MMTRL native batched environment engine ("envpool"-equivalent).
//
// The reference relies on EnvPool's C++ thread-pool stepper for batched env
// execution behind a stateless XLA handle (reference:
// cleanrl/ppo_atari_envpool_xla_jax.py:194-229).  This is the TPU-native
// equivalent for host-bound environments: game logic runs here in C++
// across a thread pool, while OBSERVATION SYNTHESIS stays on device — the
// step returns compact (tile_map, audio_index) descriptors and the JAX side
// renders pixels/spectrograms with the precomputed banks.  That keeps the
// host<->device payload at ~100 bytes/env/step instead of 56 KB.
//
// Exposed C ABI (ctypes-friendly):
//   mmtrl_make(num_envs, seed) -> handle
//   mmtrl_reset(handle, tile_maps[N*25], audio_idx[N])
//   mmtrl_step(handle, actions[N], tile_maps[N*25], audio_idx[N],
//              rewards[N], dones[N])            (auto-resets on done)
//   mmtrl_close(handle)
//
// The gridworld implemented is Minecraft2d with the exact reference
// dynamics (environments/Minecraft/Minecraft.py): 5x5 grid, +10/-10/-1
// rewards, 30-step limit, gem audible within sqrt(2) cells, gem always
// drawn gold.

#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr int kGrid = 5;
constexpr int kCells = kGrid * kGrid;
constexpr int kMaxIter = 30;
// Tile ids matching mmtrl_tpu/envs/assets.py
constexpr int kStone = 0, kAgent = 1, kGood = 2, kBad = 3, kGem = 4;
constexpr float kRewardStep = -1.f, kRewardGood = 10.f, kRewardBad = -10.f;

struct Env {
  int agent_r, agent_c, good_r, good_c, bad_r, bad_c, gem_r, gem_c;
  int gem_type;  // 0 gold, 1 iron
  int t;
  std::mt19937 rng;

  void reset() {
    // 4 distinct cells, uniform (reference rejection-samples the same
    // distribution, Minecraft.py:77-115).
    int cells[kCells];
    for (int i = 0; i < kCells; ++i) cells[i] = i;
    for (int i = 0; i < 4; ++i) {
      std::uniform_int_distribution<int> d(i, kCells - 1);
      std::swap(cells[i], cells[d(rng)]);
    }
    agent_r = cells[0] / kGrid; agent_c = cells[0] % kGrid;
    good_r = cells[1] / kGrid;  good_c = cells[1] % kGrid;
    bad_r = cells[2] / kGrid;   bad_c = cells[2] % kGrid;
    gem_r = cells[3] / kGrid;   gem_c = cells[3] % kGrid;
    gem_type = std::uniform_int_distribution<int>(0, 1)(rng);
    t = 0;
  }

  void observe(int32_t* tiles, int32_t* audio_idx) const {
    for (int i = 0; i < kCells; ++i) tiles[i] = kStone;
    tiles[gem_r * kGrid + gem_c] = kGem;  // always drawn gold
    tiles[bad_r * kGrid + bad_c] = kBad;
    tiles[good_r * kGrid + good_c] = kGood;
    tiles[agent_r * kGrid + agent_c] = kAgent;
    const int dr = agent_r - gem_r, dc = agent_c - gem_c;
    *audio_idx = (dr * dr + dc * dc <= 2) ? gem_type : 2;  // d <= 1.5
  }

  void step(int action, float* reward, uint8_t* done) {
    switch (action) {  // UP, DOWN, RIGHT, LEFT (Minecraft.py:13-21)
      case 0: agent_r = agent_r > 0 ? agent_r - 1 : 0; break;
      case 1: agent_r = agent_r < kGrid - 1 ? agent_r + 1 : kGrid - 1; break;
      case 2: agent_c = agent_c < kGrid - 1 ? agent_c + 1 : kGrid - 1; break;
      case 3: agent_c = agent_c > 0 ? agent_c - 1 : 0; break;
      default: break;
    }
    const bool at_good = agent_r == good_r && agent_c == good_c;
    const bool at_bad = agent_r == bad_r && agent_c == bad_c;
    const bool gold = gem_type == 0;
    if ((at_good && gold) || (at_bad && !gold)) *reward = kRewardGood;
    else if ((at_good && !gold) || (at_bad && gold)) *reward = kRewardBad;
    else *reward = kRewardStep;
    ++t;
    *done = (at_good || at_bad || t >= kMaxIter) ? 1 : 0;
    if (*done) reset();
  }
};

struct Pool {
  std::vector<Env> envs;
  int num_threads;

  explicit Pool(int num_envs, uint64_t seed) {
    envs.resize(num_envs);
    for (int i = 0; i < num_envs; ++i) {
      envs[i].rng.seed(seed + static_cast<uint64_t>(i) * 0x9E3779B97F4A7C15ull);
      envs[i].reset();
    }
    num_threads = static_cast<int>(
        std::min<size_t>(std::thread::hardware_concurrency(), 8));
    if (num_threads < 1) num_threads = 1;
  }

  template <typename F>
  void parallel_for(F&& fn) {
    const int n = static_cast<int>(envs.size());
    if (n < 64 || num_threads == 1) {  // threading overhead not worth it
      for (int i = 0; i < n; ++i) fn(i);
      return;
    }
    std::vector<std::thread> workers;
    const int chunk = (n + num_threads - 1) / num_threads;
    for (int w = 0; w < num_threads; ++w) {
      const int lo = w * chunk, hi = std::min(n, lo + chunk);
      if (lo >= hi) break;
      workers.emplace_back([lo, hi, &fn] {
        for (int i = lo; i < hi; ++i) fn(i);
      });
    }
    for (auto& th : workers) th.join();
  }
};

std::mutex g_mutex;
std::map<int64_t, Pool*> g_pools;
int64_t g_next_handle = 1;

}  // namespace

extern "C" {

int64_t mmtrl_make(int32_t num_envs, uint64_t seed) {
  std::lock_guard<std::mutex> lock(g_mutex);
  const int64_t handle = g_next_handle++;
  g_pools[handle] = new Pool(num_envs, seed);
  return handle;
}

int32_t mmtrl_num_envs(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_pools.find(handle);
  return it == g_pools.end() ? -1
                             : static_cast<int32_t>(it->second->envs.size());
}

void mmtrl_reset(int64_t handle, int32_t* tiles, int32_t* audio_idx) {
  Pool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  pool->parallel_for([&](int i) {
    pool->envs[i].reset();
    pool->envs[i].observe(tiles + i * kCells, audio_idx + i);
  });
}

void mmtrl_step(int64_t handle, const int32_t* actions, int32_t* tiles,
                int32_t* audio_idx, float* rewards, uint8_t* dones) {
  Pool* pool;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    pool = g_pools.at(handle);
  }
  pool->parallel_for([&](int i) {
    pool->envs[i].step(actions[i], rewards + i, dones + i);
    pool->envs[i].observe(tiles + i * kCells, audio_idx + i);
  });
}

void mmtrl_close(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_pools.find(handle);
  if (it != g_pools.end()) {
    delete it->second;
    g_pools.erase(it);
  }
}

}  // extern "C"
