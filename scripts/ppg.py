"""Phasic Policy Gradient — the reference's cleanrl/ppg_procgen.py.  The
IMPALA CNN agent and the PPG phase structure are identical; the benchmark
env is ``procmaze``, a device-resident procgen-contract procedural level
distribution (envs/procmaze.py) with the reference's ``--num-levels`` /
``--start-level`` split flags (ppg_procgen.py:73-76).

    python scripts/ppg.py --env-id procmaze --num-levels 200
    python scripts/ppg.py --env-id minecraft --n-iteration 4
"""

import dataclasses

from _common import BasePPOArgs, field

from mmtrl_tpu.algos.ppo.ppg import PPGAgent, PPGConfig, make_ppg
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("ppg", "the name of this experiment")
    env_id: str = field("minecraft", "the id of the environment")
    num_envs: int = field(8, "parallel envs")
    num_steps: int = field(64, "rollout length")
    n_iteration: int = field(32, "policy-phase rollouts per PPG cycle")
    e_policy: int = field(1, "policy epochs per rollout")
    e_auxiliary: int = field(6, "auxiliary epochs per cycle")
    beta_clone: float = field(1.0, "KL clone coefficient")
    num_aux_minibatches: int = field(4, "aux-phase minibatches")
    clip_rewards: bool = field(False, "PPG uses raw rewards")
    num_levels: int = field(200, "procgen-style train-level count (procmaze)")
    start_level: int = field(0, "procgen-style first train level (procmaze)")
    aux_store_dtype: str = field(
        "auto",
        "aux-phase obs storage dtype: 'auto' (int8 for procmaze, whose "
        "{-1,+1} planes it stores exactly; bfloat16 otherwise), or an "
        "explicit dtype",
    )
    eval_rollout_steps: int = field(
        512,
        "greedy-eval rollout length per env for the procmaze train/held-out "
        "generalization split (longer = more episodes = lower eval variance)",
    )


def main(args=None):
    args = args or cli(Args)
    if args.env_id.lower() == "procmaze":
        env = make(args.env_id, num_levels=args.num_levels,
                   start_level=args.start_level)
    else:
        env = make(args.env_id)
    cfg = PPGConfig(
        total_timesteps=args.total_timesteps,
        learning_rate=args.learning_rate,
        num_envs=args.num_envs,
        num_steps=args.num_steps,
        anneal_lr=args.anneal_lr,
        gamma=args.gamma,
        gae_lambda=args.gae_lambda,
        num_minibatches=args.num_minibatches,
        update_epochs=args.update_epochs,
        clip_coef=args.clip_coef,
        ent_coef=args.ent_coef,
        vf_coef=args.vf_coef,
        max_grad_norm=args.max_grad_norm,
        n_iteration=args.n_iteration,
        e_policy=args.e_policy,
        e_auxiliary=args.e_auxiliary,
        beta_clone=args.beta_clone,
        num_aux_minibatches=args.num_aux_minibatches,
        aux_store_dtype=(
            ("int8" if args.env_id.lower() == "procmaze" else "bfloat16")
            if args.aux_store_dtype == "auto"
            else args.aux_store_dtype
        ),
    )

    # One PPG cycle consumes n_iteration rollouts; reuse the PPO runner by
    # scaling batch_size accordingly (num_updates/opt_steps_per_update come
    # from PPGConfig's cycle-aware overrides).
    class CycleCfg:
        num_updates = cfg.num_updates
        batch_size = cfg.batch_size * cfg.n_iteration
        anneal_lr = cfg.anneal_lr
        learning_rate = cfg.learning_rate
        opt_steps_per_update = cfg.opt_steps_per_update

    model = PPGAgent(num_actions=env.num_actions)
    init_runner, ppg_cycle = make_ppg(env, model, cfg)
    out = run_training(init_runner, ppg_cycle, CycleCfg, args)

    if args.env_id.lower() == "procmaze":
        # The procgen generalization metric (ppg_procgen.py's purpose):
        # greedy eval on the TRAIN level window vs a DISJOINT held-out
        # window of the same distribution.
        import jax

        from mmtrl_tpu.envs.procmaze import ProcMaze
        from mmtrl_tpu.utils.evaluate import evaluate_policy

        params = out["runner"].train_state.params
        apply2 = lambda p, o: model.apply(p, o)[:2]  # noqa: E731
        # Held-out window is [800, 1000); the generalization metric is only
        # valid if the train window never reaches into it.
        tr_lo, tr_hi = args.start_level, args.start_level + args.num_levels
        if max(tr_lo, 800) < min(tr_hi, 1000):
            raise SystemExit(
                f"train levels [{tr_lo},{tr_hi}) overlap the held-out "
                "window [800,1000) — shrink --num-levels/--start-level"
            )
        test_env = ProcMaze(num_levels=200, start_level=800)
        key = jax.random.PRNGKey(args.seed + 1000)
        k_tr, k_te = jax.random.split(key)
        res = {}
        for tag, e, k in (("train", env, k_tr), ("test", test_env, k_te)):
            m = jax.device_get(
                jax.jit(
                    lambda p, kk, e=e: evaluate_policy(
                        e, apply2, p, kk, num_envs=64,
                        num_steps=args.eval_rollout_steps,
                    )
                )(params, k)
            )
            res[tag] = float(m["eval/episodic_return"])
            print(
                f"procmaze {tag} levels: return={res[tag]:.2f} over "
                f"{int(m['eval/episodes'])} episodes"
            )
        out["generalization"] = res
        # Expose the generalization split to TensorBoard so the tuner can
        # optimize the HELD-OUT return directly (round-4 transfer sweep;
        # reference tuner reads back TB scalars, cleanrl_utils/tuner.py:95).
        from mmtrl_tpu.core.metrics import MetricsWriter

        w = MetricsWriter(out["run_name"])
        w.scalar("charts/heldout_return", res["test"], out["global_step"])
        w.scalar("charts/train_eval_return", res["train"], out["global_step"])
        w.close()
    return out


if __name__ == "__main__":
    main()
