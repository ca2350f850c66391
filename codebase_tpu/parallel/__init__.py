from codebase_tpu.parallel.mesh import (
    make_mesh,
    env_axis_sharding,
    replicated,
    dqn_state_shardings,
    ac_state_shardings,
)

__all__ = [
    "make_mesh",
    "env_axis_sharding",
    "replicated",
    "dqn_state_shardings",
    "ac_state_shardings",
]
