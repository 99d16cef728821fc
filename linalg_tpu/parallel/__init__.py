from .distributed import (global_mesh_shape, host_local_batch_slice,
                          init_distributed, is_distributed)
from .expert import (make_ep_device_train_step, make_ep_eval,
                     make_ep_train_step, moe_param_specs)
from .fsdp import (fsdp_param_specs, fsdp_shardings,
                   make_fsdp_device_train_step, make_fsdp_eval)
from .mesh import make_mesh, pick_dp_tp
from .pipeline import (make_pp_1f1b_grads, make_pp_1f1b_train_step,
                       make_pp_loss, make_pp_train_step, pp_param_specs)
from .ring import make_ring_attention, ring_attention_local
from .ring_pallas import make_ring_attention_pallas, ring_attention_pallas_local
from .sharding import (
    dryrun_multichip,
    gpt_param_specs,
    make_sharded_attn,
    make_sharded_device_train_step,
    make_sharded_eval,
    make_sharded_train_step,
    make_sp_device_train_step,
    make_sp_eval,
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
    "make_ring_attention_pallas",
    "ring_attention_pallas_local",
    "make_sharded_train_step",
    "make_sharded_device_train_step",
    "make_sharded_eval",
    "make_sp_train_step",
    "make_sp_device_train_step",
    "make_sp_eval",
    "make_pp_loss",
    "make_pp_train_step",
    "make_pp_1f1b_grads",
    "make_pp_1f1b_train_step",
    "make_ep_train_step",
    "make_ep_device_train_step",
    "make_ep_eval",
    "fsdp_param_specs",
    "fsdp_shardings",
    "make_fsdp_device_train_step",
    "make_fsdp_eval",
    "init_distributed",
    "is_distributed",
    "host_local_batch_slice",
    "global_mesh_shape",
    "dryrun_multichip",
]
