from codebase_tpu.envs.api import Environment, TimeStep
from codebase_tpu.envs.factory import make_env

__all__ = ["Environment", "TimeStep", "make_env"]
