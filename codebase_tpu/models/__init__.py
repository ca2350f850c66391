from codebase_tpu.models.networks import MLPSpec, RNNSpec, make_network_spec
from codebase_tpu.models.multi_agent import MultiAgentNetwork
from codebase_tpu.models.mixers import QMixer
from codebase_tpu.models import distributions

__all__ = [
    "MLPSpec",
    "RNNSpec",
    "make_network_spec",
    "MultiAgentNetwork",
    "QMixer",
    "distributions",
]
