from .expert import make_ep_train_step, moe_param_specs
from .mesh import make_mesh, pick_dp_tp
from .pipeline import (make_pp_1f1b_grads, make_pp_1f1b_train_step,
                       make_pp_loss, make_pp_train_step, pp_param_specs)
from .ring import make_ring_attention, ring_attention_local
from .sharding import (
    dryrun_multichip,
    gpt_param_specs,
    make_sharded_attn,
    make_sharded_device_train_step,
    make_sharded_eval,
    make_sharded_train_step,
    make_sp_train_step,
)

__all__ = [
    "make_mesh",
    "pick_dp_tp",
    "gpt_param_specs",
    "pp_param_specs",
    "moe_param_specs",
    "make_sharded_attn",
    "make_ring_attention",
    "ring_attention_local",
    "make_sharded_train_step",
    "make_sharded_device_train_step",
    "make_sharded_eval",
    "make_sp_train_step",
    "make_pp_loss",
    "make_pp_train_step",
    "make_pp_1f1b_grads",
    "make_pp_1f1b_train_step",
    "make_ep_train_step",
    "dryrun_multichip",
]
