"""codebase_tpu — a TPU-native multi-agent reinforcement learning framework.

A from-scratch JAX/XLA re-design of the MARL-book codebase
(marl-book/codebase, mounted read-only at /root/reference): the same
algorithm families (IDQN/VDN/QMIX off-policy value decomposition;
IA2C/MAA2C/IPPO/MAPPO on-policy actor-critic), parameter-sharing variants,
action masking, return/reward standardisation, and experiment surface
(config presets + CLI overrides, results.csv logging, checkpointing,
eval/video, sweeps, postprocessing) — but built TPU-first:

- Environments (Level-Based Foraging, RWARE, SMAClite-style combat) are pure
  JAX step functions `step(state, action, key)` vmapped over thousands of
  instances per chip (reference: Gymnasium subprocess envs,
  `marlbase/utils/envs.py:61-63`).
- Replay, exploration, losses and optimisation run fused on-device inside a
  single jitted train iteration (reference: Python loops,
  `marlbase/dqn/train.py:298-313`).
- Multi-agent networks are one vmap over stacked per-group parameters
  (reference: `torch.jit.fork` per agent, `marlbase/utils/models.py:163-167`).
- Scaling is a `jax.sharding.Mesh`: env batch sharded along a `data` axis,
  learner gradients synced with psum collectives (reference has no
  distributed backend at all, see SURVEY.md §2).
"""

__version__ = "0.1.0"
