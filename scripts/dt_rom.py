"""Offline decision transformer on REAL 2600 cartridges.

Closes the loop the sim rows cannot: collect trajectories from the actual
emulated cartridge with a trained (or epsilon-random) behavior policy,
train the multimodal DT offline on that real data, and evaluate
return-conditioned on the same cartridge — the BASELINE.json
"Skeleton+ stereo-audio -> DT" config with the REAL ROM in every stage.

    python scripts/dt_rom.py --policy-from runs_mujoco/ckpt_rom_hl5 \
        --target-return 150 --rtg-clip 180

Stages (all host-loop; io_callback cannot cross the remote-TPU tunnel,
see docs/parallelism.md):
  1. collect: C++ pool steps SkelPlus.bin; behavior policy (the ROM-trained
     recurrent CASL PPO agent + epsilon random) acts on device
     (algos/dt/hostloop.py::collect_trajectories_host);
  2. train: the standard offline DT phase, lax.scan chunks per dispatch
     (make_dt_train_steps — same math as dt_minecraft.py);
  3. eval: return-conditioned shift-register protocol on the cartridge
     (evaluate_dt_host, identical to evaluate.evaluate_dt's published
     protocol).
"""

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp

from _common import field

from mmtrl_tpu.algos.dt import DTTrainConfig, create_dt_state, make_dt_train_steps
from mmtrl_tpu.algos.dt.hostloop import collect_trajectories_host, evaluate_dt_host
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.core.metrics import MetricsWriter
from mmtrl_tpu.models.decision_transformer import DTConfig


@dataclasses.dataclass
class Args:
    exp_name: str = field("dt_rom", "the name of this experiment")
    seed: int = field(1, "seed of the experiment")
    track: bool = field(False, "CLI compat")
    capture_video: bool = field(False, "CLI compat")
    env_id: str = field("skeleton_plus_native", "skeleton_plus_native | rally_native | brick_native")
    rom_path: str = field("", "cartridge path (default: per env-id)")
    frameskip: int = field(8, "emulator frames per env step")
    episode_steps: int = field(1500, "env-step cap per episode")
    reward_mode: str = field("shaped", "'shaped'/'kills' (skeleton), 'score'/'win' (rally)")
    repeat_action_probability: float = field(0.0, "ALE-v5 sticky actions (reference envpool setting: 0.25)")
    # --- behavior policy (stage 1) ---
    policy_from: str = field("", "Orbax dir of a host-loop run (e.g. runs_mujoco/ckpt_rom_hl5); empty = random")
    policy_kind: str = field("ppo", "behavior checkpoint kind: ppo (recurrent actor) | dqn | c51 (hostloop_dqn train states)")
    policy_epsilon: float = field(0.1, "random-action mixture for dataset diversity")
    policy_greedy: bool = field(False, "argmax instead of sampling from the policy (ppo only; value policies are always greedy)")
    policy_attn_type: str = field("casl", "ppo behavior agent attention type")
    policy_conv_size: str = field("small", "ppo behavior agent conv tower size")
    policy_fusion_type: str = field("sum", "ppo behavior agent fusion type")
    policy_n_atoms: int = field(51, "c51 behavior: categorical support atoms (must match training)")
    policy_v_min: float = field(-10.0, "c51 behavior: support lower bound")
    policy_v_max: float = field(10.0, "c51 behavior: support upper bound")
    collect_envs: int = field(16, "parallel emulated cartridges for collection")
    collect_steps: int = field(65536, "total env transitions to collect")
    # --- DT (stage 2) ---
    context_len: int = field(30, "context window K (3K tokens)")
    d_model: int = field(512, "transformer width")
    n_layers: int = field(6, "transformer depth")
    n_heads: int = field(4, "attention heads")
    dropout: float = field(0.1, "dropout rate")
    max_timestep: int = field(2048, "timestep embedding table size (> episode cap)")
    remat: bool = field(False, "rematerialize block activations")
    moe_experts: int = field(0, "MoE FFN experts per block (0: dense FFN)")
    moe_top_k: int = field(2, "MoE router top-k")
    moe_dispatch: str = field(
        "dense", "MoE token dispatch: 'dense' (GShard einsum) or 'gather' "
        "(capacity-based top-k, models/moe.py)"
    )
    learning_rate: float = field(6e-4, "peak LR")
    warmup_steps: int = field(512, "LR warmup steps")
    total_steps: int = field(15000, "offline training steps")
    batch_size: int = field(64, "training batch size")
    steps_per_dispatch: int = field(30, "lax.scan chunk per dispatch")
    print_interval: int = field(600, "print every n training steps")
    # --- eval (stage 3) ---
    eval_steps: int = field(6000, "return-conditioned eval env-steps (pool steps x envs)")
    target_return: float = field(150.0, "return target for conditioning")
    rtg_clip: Optional[float] = field(None, "clip the running target to the data support")
    eval_greedy: bool = field(True, "greedy action selection in eval")
    save_interval: int = field(0, "save train state every n steps (0: never)")
    save_dir: str = field("saved_agents", "checkpoint folder")


def _make_env(args):
    from mmtrl_tpu.envs.homebrew_native import make_native_env

    return make_native_env(
        args.env_id,
        num_envs=args.collect_envs,
        rom_path=args.rom_path,
        seed=args.seed,
        frameskip=args.frameskip,
        episode_steps=args.episode_steps,
        reward_mode=args.reward_mode,
        repeat_action_probability=args.repeat_action_probability,
    )


def _behavior_policy(args, env):
    """(policy_fn, carry) for collect_trajectories_host, or (None, None)."""
    if not args.policy_from:
        return None, None
    from mmtrl_tpu.core.checkpoint import load_run

    if args.policy_kind in ("dqn", "c51"):
        # Value-learning behavior: the saved hostloop_dqn/c51 train state is
        # the raw DQNTrainState pytree (hostloop_dqn.py saves it unwrapped),
        # so params live at the top level.  Value policies have no action
        # distribution to sample — acting is argmax-Q + the epsilon mixture,
        # exactly the policy the Q run itself evaluates greedily.
        from mmtrl_tpu.models import DistributionalQNetwork, QNetwork

        restored = load_run(args.policy_from)
        q_params = jax.tree_util.tree_map(jnp.asarray, restored["params"])
        if args.policy_kind == "dqn":
            qmodel = QNetwork(num_actions=env.num_actions, input_scale=1.0)

            def q_values(obs):
                return qmodel.apply(q_params, obs)
        else:
            qmodel = DistributionalQNetwork(
                num_actions=env.num_actions,
                n_atoms=args.policy_n_atoms,
                input_scale=1.0,
            )
            atoms = jnp.linspace(
                args.policy_v_min, args.policy_v_max, args.policy_n_atoms
            )

            def q_values(obs):
                return (qmodel.apply(q_params, obs) * atoms).sum(axis=-1)

        eps = args.policy_epsilon

        def policy_fn(k, obs, done, carry):
            k_rand, k_mix = jax.random.split(k)
            pi = jnp.argmax(q_values(obs), axis=-1)
            rand = jax.random.randint(
                k_rand, pi.shape, 0, env.num_actions, pi.dtype
            )
            mix = jax.random.uniform(k_mix, pi.shape) < eps
            return jnp.where(mix, rand, pi), carry

        return policy_fn, None

    from mmtrl_tpu.models import MultimodalRecurrentAgent

    behavior = MultimodalRecurrentAgent(
        num_actions=env.num_actions,
        conv_type=args.policy_conv_size,
        attn_type=args.policy_attn_type or None,
        fusion_type=args.policy_fusion_type,
        input_scale=1.0,
    )
    restored = load_run(args.policy_from)
    b_params = jax.tree_util.tree_map(
        jnp.asarray, restored["train_state"]["params"]
    )
    carry = behavior.initial_carry(args.collect_envs)
    eps = args.policy_epsilon

    def policy_fn(k, obs, done, carry):
        k_pi, k_rand, k_mix = jax.random.split(k, 3)
        logits, _, carry = behavior.apply(b_params, obs[None], done[None], carry)
        pi = (
            jnp.argmax(logits[0], axis=-1)
            if args.policy_greedy
            else jax.random.categorical(k_pi, logits[0])
        )
        rand = jax.random.randint(k_rand, pi.shape, 0, env.num_actions, pi.dtype)
        return (
            jnp.where(jax.random.uniform(k_mix, pi.shape) < eps, rand, pi),
            carry,
        )

    return policy_fn, carry


def main(args=None):
    args = args or cli(Args)
    if args.episode_steps > args.max_timestep:
        # nn.Embed clamps out-of-range gathers on TPU: every timestep past
        # the table would silently share the last embedding row.
        raise SystemExit(
            f"--episode-steps {args.episode_steps} exceeds --max-timestep "
            f"{args.max_timestep}; raise the embedding table to at least "
            "the episode cap"
        )
    run_name = f"{args.env_id}__{args.exp_name}__{args.seed}__{int(time.time())}"
    writer = MetricsWriter(run_name, args)
    key = jax.random.PRNGKey(args.seed)

    env = _make_env(args)
    try:
        policy_fn, carry = _behavior_policy(args, env)
        key, k_collect = jax.random.split(key)
        pool_steps = max(1, args.collect_steps // args.collect_envs)
        t0 = time.time()
        buffer, bstats = collect_trajectories_host(
            env, k_collect, pool_steps, policy_fn, carry,
            print_every=max(1, pool_steps // 10),
        )
        print(
            f"collected {pool_steps * args.collect_envs} transitions in "
            f"{time.time() - t0:.0f}s; behavior return "
            f"{bstats['behavior/episodic_return']:.2f} over "
            f"{int(bstats['behavior/episodes'])} episodes",
            flush=True,
        )
        for tag, val in bstats.items():
            writer.scalar(tag, val, 0)

        model_cfg = DTConfig(
            num_actions=env.num_actions,
            context_len=args.context_len,
            d_model=args.d_model,
            n_layers=args.n_layers,
            n_heads=args.n_heads,
            dropout=args.dropout,
            max_timestep=args.max_timestep,
            remat=args.remat,
            moe_experts=args.moe_experts,
            moe_top_k=args.moe_top_k,
            moe_dispatch=args.moe_dispatch,
        )
        train_cfg = DTTrainConfig(
            learning_rate=args.learning_rate,
            warmup_steps=args.warmup_steps,
            total_steps=args.total_steps,
            batch_size=args.batch_size,
        )
        key, k_init, k_sample = jax.random.split(key, 3)
        example = jax.jit(
            lambda buf, k: buf.sample(k, args.batch_size, args.context_len)
        )(buffer, k_sample)
        state = create_dt_state(k_init, model_cfg, train_cfg, example)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
        print(f"DT params: {n_params/1e6:.1f}M", flush=True)

        g = max(1, args.steps_per_dispatch)
        train_g = jax.jit(
            make_dt_train_steps(model_cfg, args.batch_size, args.context_len, g),
            donate_argnums=(0,),
        )
        start = time.time()
        for step in range(g, args.total_steps + 1, g):
            key, k_batch = jax.random.split(key)
            state, metrics = train_g(state, buffer, k_batch)
            if step % args.print_interval < g:
                metrics = jax.device_get(metrics)
                tokens_sec = (
                    step * args.batch_size * 3 * args.context_len
                    / max(time.time() - start, 1e-9)
                )
                writer.scalars(metrics, step)
                print(
                    f"step={step}/{args.total_steps} "
                    f"loss={metrics['dt/loss']:.4f} "
                    f"acc={metrics['dt/action_accuracy']:.3f} "
                    f"tokens/s={tokens_sec:.0f}",
                    flush=True,
                )
            if args.save_interval and step % args.save_interval < g:
                from mmtrl_tpu.core.checkpoint import save_run

                save_run(state, run_name, args.save_dir)

        key, k_eval = jax.random.split(key)
        # A surviving policy only finishes episodes at the time-limit cap, so
        # fewer than episode_steps pool iterations would record ZERO episodes
        # (the first run of this script hit exactly that: eval/episodes=0).
        eval_pool_steps = max(
            args.episode_steps + 100, args.eval_steps // args.collect_envs
        )
        results = evaluate_dt_host(
            env,
            model_cfg,
            state.params,
            k_eval,
            args.target_return,
            num_steps=eval_pool_steps,
            greedy=args.eval_greedy,
            rtg_clip=args.rtg_clip,
        )
        for tag, val in results.items():
            writer.scalar(tag, float(val), args.total_steps)
        print(
            "final return-conditioned eval: "
            + " ".join(f"{k_}={float(v):.2f}" for k_, v in results.items()),
            flush=True,
        )
        if args.save_interval:
            from mmtrl_tpu.core.checkpoint import save_run

            save_run(state, run_name, args.save_dir)
        writer.close()
        return {**bstats, **{k_: float(v) for k_, v in results.items()}}
    finally:
        env.close()


if __name__ == "__main__":
    main()
