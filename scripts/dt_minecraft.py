"""Offline phase: decision transformer on Minecraft2d trajectories.

The reference's declared-but-absent offline stage (README.md:10-15,
decision-transformer/ is empty upstream): collect trajectories with the
vectorized device env, train the multimodal DT by return-conditioned
behavior cloning, evaluate conditioned on a target return.

    python scripts/dt_minecraft.py --collect-steps 2048 --total-steps 500
"""

import dataclasses
import time

import jax
import numpy as np

from _common import field

from mmtrl_tpu.algos.dt import (
    DTTrainConfig,
    collect_trajectories,
    create_dt_state,
    evaluate_dt,
    make_dt_train_step,
)
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.core.checkpoint import save_run
from mmtrl_tpu.core.metrics import MetricsWriter
from mmtrl_tpu.envs import make
from mmtrl_tpu.models.decision_transformer import DTConfig


@dataclasses.dataclass
class Args:
    exp_name: str = field("dt_minecraft", "the name of this experiment")
    seed: int = field(1, "seed of the experiment")
    env_id: str = field("minecraft", "the id of the environment")
    collect_steps: int = field(4096, "rollout steps per env for the dataset")
    collect_envs: int = field(16, "parallel envs for dataset collection")
    context_len: int = field(30, "DT context length K (3K tokens)")
    d_model: int = field(512, "transformer width")
    n_layers: int = field(6, "transformer depth")
    n_heads: int = field(4, "attention heads (head_dim = d_model/n_heads)")
    dropout: float = field(0.1, "dropout rate")
    remat: bool = field(False, "rematerialize block activations (jax.checkpoint): ~1 extra fwd of FLOPs for O(n_layers) less activation HBM")
    max_timestep: int = field(64, "timestep embedding table size (> max episode len)")
    batch_size: int = field(64, "training batch size")
    learning_rate: float = field(6e-4, "peak learning rate")
    total_steps: int = field(5000, "gradient steps")
    warmup_steps: int = field(512, "LR warmup steps")
    target_return: float = field(10.0, "evaluation return-to-go conditioning")
    rtg_clip: float = field(10.0, "cap the running rtg at the data support")
    eval_greedy: bool = field(True, "argmax actions at eval (False: sample)")
    eval_envs: int = field(16, "evaluation envs")
    eval_steps: int = field(64, "evaluation env steps")
    print_interval: int = field(50, "log every n steps")
    steps_per_dispatch: int = field(
        1, "fused train steps per device dispatch (amortizes per-call cost)"
    )
    save_interval: int = field(0, "save every n steps (0: never)")
    save_dir: str = field("saved_agents", "checkpoint folder")
    # Behavior policy for data collection (random if unset)
    policy_from: str = field("", "PPO checkpoint to collect trajectories with")
    policy_script: str = field("train", "entry script that produced the checkpoint")
    policy_epsilon: float = field(0.1, "random-action mixture during collection")
    policy_attn_type: str = field("casl", "behavior agent attention type")
    policy_conv_size: str = field("small", "behavior agent conv size")
    policy_input_scale: float = field(1.0, "behavior agent input scale")


def main(args=None):
    args = args or cli(Args)
    run_name = f"{args.env_id}__{args.exp_name}__{args.seed}__{int(time.time())}"
    writer = MetricsWriter(run_name, args)
    key = jax.random.PRNGKey(args.seed)

    env = make(args.env_id)
    key, k_collect = jax.random.split(key)
    policy_fn, policy_carry = None, None
    if args.policy_from:
        # Behavior policy = trained PPO agent + epsilon-random mixture.
        from mmtrl_tpu.core.checkpoint import load_run
        from mmtrl_tpu.models import MultimodalRecurrentAgent
        from mmtrl_tpu.models.distributions import categorical_sample

        behavior = MultimodalRecurrentAgent(
            num_actions=env.num_actions,
            conv_type=args.policy_conv_size,
            attn_type=args.policy_attn_type or None,
            fusion_type="sum",
            input_scale=args.policy_input_scale,
        )
        restored = load_run(args.policy_from)
        b_params = restored["train_state"]["params"]
        policy_carry = behavior.initial_carry(args.collect_envs)
        eps = args.policy_epsilon

        def policy_fn(k, obs, done, carry):
            k_pi, k_rand, k_mix = jax.random.split(k, 3)
            logits, _, carry = behavior.apply(b_params, obs[None], done[None], carry)
            a_pi = categorical_sample(k_pi, logits[0])
            a_rand = jax.random.randint(
                k_rand, a_pi.shape, 0, env.num_actions, dtype=a_pi.dtype
            )
            import jax.numpy as jnp

            mix = jax.random.uniform(k_mix, a_pi.shape) < eps
            return jnp.where(mix, a_rand, a_pi), carry

    print(f"collecting {args.collect_steps}x{args.collect_envs} steps...")
    buffer = jax.jit(
        lambda k: collect_trajectories(
            env, k, args.collect_steps, args.collect_envs,
            policy_fn=policy_fn, policy_carry=policy_carry,
        )
    )(k_collect)
    print(
        f"dataset: {buffer.horizon}x{buffer.num_streams} steps, "
        f"{int(np.asarray(buffer.episode_starts).sum())} episodes"
    )

    model_cfg = DTConfig(
        num_actions=env.num_actions,
        context_len=args.context_len,
        d_model=args.d_model,
        n_layers=args.n_layers,
        n_heads=args.n_heads,
        dropout=args.dropout,
        max_timestep=args.max_timestep,
        remat=args.remat,
    )
    train_cfg = DTTrainConfig(
        learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps,
        total_steps=args.total_steps,
        batch_size=args.batch_size,
    )

    key, k_init, k_sample = jax.random.split(key, 3)
    example = buffer.sample(k_sample, args.batch_size, args.context_len)
    state = create_dt_state(k_init, model_cfg, train_cfg, example)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"DT params: {n_params/1e6:.1f}M")

    g = max(1, args.steps_per_dispatch)
    if g > 1:
        from mmtrl_tpu.algos.dt import make_dt_train_steps

        train_g = jax.jit(
            make_dt_train_steps(
                model_cfg, args.batch_size, args.context_len, g
            ),
            donate_argnums=(0,),
        )
    train_step = jax.jit(make_dt_train_step(model_cfg), donate_argnums=(0,))
    # NB: the buffer must be an ARGUMENT, not a closure — closed-over device
    # arrays are baked into the HLO as constants (gigabytes of literal).
    sample = jax.jit(
        lambda buf, k: buf.sample(k, args.batch_size, args.context_len)
    )

    start = time.time()
    for step in range(g, args.total_steps + 1, g):
        key, k_batch, k_drop = jax.random.split(key, 3)
        if g > 1:
            state, metrics = train_g(state, buffer, k_batch)
        else:
            state, metrics = train_step(state, sample(buffer, k_batch), k_drop)
        if step % args.print_interval == 0:
            metrics = jax.device_get(metrics)
            tokens_sec = (
                step * args.batch_size * 3 * args.context_len
                / max(time.time() - start, 1e-9)
            )
            writer.scalars(metrics, step)
            writer.scalar("charts/tokens_per_sec", tokens_sec, step)
            print(
                f"step={step}/{args.total_steps} loss={metrics['dt/loss']:.4f} "
                f"acc={metrics['dt/action_accuracy']:.3f} tokens/s={tokens_sec:.0f}"
            )
        if args.save_interval and step % args.save_interval == 0:
            save_run(state, run_name, args.save_dir)

    key, k_eval = jax.random.split(key)
    results = jax.device_get(
        jax.jit(
            lambda params, k: evaluate_dt(
                env,
                model_cfg,
                params,
                k,
                args.target_return,
                num_envs=args.eval_envs,
                num_steps=args.eval_steps,
                rtg_clip=args.rtg_clip,
                greedy=args.eval_greedy,
            )
        )(state.params, k_eval)
    )
    for tag, val in results.items():
        writer.scalar(tag, float(val), args.total_steps)
    print({k_: float(v) for k_, v in results.items()})
    if args.save_interval:
        save_run(state, run_name, args.save_dir)
    writer.close()
    return results


if __name__ == "__main__":
    main()
