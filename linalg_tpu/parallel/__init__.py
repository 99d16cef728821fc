from .mesh import make_mesh, pick_dp_tp
from .sharding import dryrun_multichip, gpt_param_specs, make_sharded_train_step

__all__ = [
    "make_mesh",
    "pick_dp_tp",
    "gpt_param_specs",
    "make_sharded_train_step",
    "dryrun_multichip",
]
