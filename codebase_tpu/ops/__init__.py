from codebase_tpu.ops.schedules import epsilon_schedule
from codebase_tpu.ops.returns import nstep_returns
from codebase_tpu.ops.running_stats import RunningMeanStd

__all__ = ["epsilon_schedule", "nstep_returns", "RunningMeanStd"]
