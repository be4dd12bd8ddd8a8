#!/usr/bin/env python
"""Component-level DT step breakdown by two-config subtraction.

jax.profiler cannot capture over the axon tunnel (memory: start_trace
hangs), so costs are localized by timing full-step variants that each
remove one component, all fetch-chained (the only valid timing on this
backend — see RESULTS.md methodology):

  full            : the bench.py flagship step (B=64, K=30, d512 L6, bf16)
  no_dropout      : dropout=0.0 (flax short-circuits) -> RNG/mask cost
  vector_state    : state_kind='vector' (512-d states) -> two-tower cost
  fwd_only        : loss fwd without grad -> backward cost
  no_opt          : grads computed, optimizer skipped -> optax cost

Usage: python tools/bench_dt_breakdown.py [B] [iters]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timed(step, state, batch, key, iters):
    state2, m = step(state, batch, key)
    jax.tree_util.tree_map(lambda x: x, m)
    float(m["dt/loss"])
    t0 = time.perf_counter()
    s = state2
    for _ in range(iters):
        s, m = step(s, batch, key)
    float(m["dt/loss"])
    return (time.perf_counter() - t0) / iters


def main():
    from mmtrl_tpu.algos.dt import DTTrainConfig, create_dt_state, make_dt_train_step
    from mmtrl_tpu.models.decision_transformer import DecisionTransformer, DTConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    K = 30
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    tcfg = DTTrainConfig(batch_size=B, total_steps=1000)

    def mm_batch():
        states = jax.random.uniform(
            k1, (B, K, 2, 84, 84), jnp.bfloat16, minval=-1.0, maxval=1.0
        )
        rtg = jax.random.uniform(k2, (B, K), jnp.float32, minval=-30.0, maxval=10.0)
        actions = jax.random.randint(k3, (B, K), 0, 4, dtype=jnp.int32)
        timesteps = jnp.tile(jnp.arange(K, dtype=jnp.int32), (B, 1))
        mask = jnp.ones((B, K), dtype=bool)
        return (rtg, states, actions, timesteps, mask)

    base = dict(
        num_actions=4, context_len=K, d_model=512, n_layers=6, n_heads=4,
        dropout=0.1, max_timestep=64,
    )
    results = {}

    def bench(tag, cfg, batch, step_maker=None):
        state = create_dt_state(key, cfg, tcfg, batch)
        mk = step_maker or make_dt_train_step
        step = jax.jit(mk(cfg), donate_argnums=(0,))
        dt = timed(step, state, batch, key, iters)
        results[tag] = dt
        print(f"{tag:>14}: {dt*1e3:7.2f} ms/step  "
              f"({B*3*K/dt/1e3:８.0f}k tokens/s)".replace("８", ""))

    batch = mm_batch()
    bench("full", DTConfig(**base), batch)
    bench("no_dropout", DTConfig(**{**base, "dropout": 0.0}), batch)

    vb = (batch[0], jax.random.uniform(k1, (B, K, 512), jnp.float32),
          batch[2], batch[3], batch[4])
    bench("vector_state",
          DTConfig(**{**base, "state_kind": "vector", "state_dim": 512}), vb)

    def fwd_only_maker(cfg):
        model = DecisionTransformer(cfg)

        def step(state, b, dk):
            rtg, states, actions, timesteps, mask = b
            logits = model.apply(
                state.params, rtg, states, actions, timesteps,
                deterministic=False, rngs={"dropout": dk},
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, actions[..., None].astype(jnp.int32), axis=-1
            )[..., 0]
            loss = nll.mean()
            # thread a dependency through params so iterations chain
            state = state.replace(
                params=jax.tree_util.tree_map(
                    lambda p: p + 0.0 * loss.astype(p.dtype), state.params
                )
            )
            return state, {"dt/loss": loss}

        return step

    bench("fwd_only", DTConfig(**base), batch, fwd_only_maker)

    def no_opt_maker(cfg):
        from mmtrl_tpu.algos.dt.train import make_dt_train_step as _mk
        model = DecisionTransformer(cfg)

        def step(state, b, dk):
            rtg, states, actions, timesteps, mask = b

            def loss_fn(params):
                logits = model.apply(
                    params, rtg, states, actions, timesteps,
                    deterministic=False, rngs={"dropout": dk},
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                return -jnp.take_along_axis(
                    logp, actions[..., None].astype(jnp.int32), axis=-1
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.replace(
                params=jax.tree_util.tree_map(
                    lambda p, g: p - 0.0 * g.astype(p.dtype), state.params, grads
                )
            )
            return state, {"dt/loss": loss}

        return step

    bench("no_opt", DTConfig(**base), batch, no_opt_maker)

    print("\nderived:")
    f = results["full"]
    print(f"  dropout cost   : {(f - results['no_dropout'])*1e3:6.2f} ms")
    print(f"  two-tower cost : {(f - results['vector_state'])*1e3:6.2f} ms")
    print(f"  backward cost  : {(results['no_opt'] - results['fwd_only'])*1e3:6.2f} ms")
    print(f"  optimizer cost : {(f - results['no_opt'])*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
