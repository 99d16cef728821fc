"""Expert parallelism: MoE expert weights sharded over an 'ep' mesh axis.

The MoE layer (models.moe) keeps all routing math as dense einsums over an
explicit expert axis, so expert parallelism is pure GSPMD: shard the E axis
of the expert weights (and nothing else) and XLA lowers the dispatch
einsum ``nec,nd->ecd`` / combine ``nec,ecd->nd`` into the all-to-all style
collectives over ICI. No shard_map, no hand-written comm.

Composes with data parallelism: pass a ('dp', 'ep') mesh and the batch is
dp-sharded while experts are ep-sharded.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.moe import MoEGPTConfig, moe_gpt_loss

__all__ = ["moe_param_specs", "make_ep_train_step"]


def moe_param_specs() -> dict:
    """PartitionSpecs for the MoE-GPT pytree: expert axis (axis 1 of the
    (L, E, ...) stacked weights) on 'ep'; attention/router/embeddings
    replicated."""
    layer_specs = {
        "ln1_g": P(), "ln1_b": P(),
        "Wq": P(), "Wk": P(), "Wv": P(), "Wo": P(),
        "ln2_g": P(), "ln2_b": P(),
        "Wr": P(),
        "W1": P(None, "ep", None, None),
        "b1": P(None, "ep", None),
        "W2": P(None, "ep", None, None),
        "b2": P(None, "ep", None),
    }
    return {"tok_W": P(), "head_b": P(), "layers": layer_specs}


def make_ep_train_step(cfg: MoEGPTConfig, mesh: Mesh, *,
                       lr: float = 3e-4, weight_decay: float = 0.01,
                       dp_axis: Optional[str] = None):
    """jitted (params, opt_state, x, y) -> (params, opt_state, loss) with
    experts ep-sharded (and the batch dp-sharded when ``dp_axis`` given)."""
    from ..train.optim import AdamWState, adamw_update, gpt_wd_mask

    assert cfg.n_experts % mesh.shape["ep"] == 0, (
        "n_experts must divide by the ep axis size"
    )
    pspecs = moe_param_specs()
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda v: isinstance(v, P))
    scalar_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(dp_axis, None))
    opt_state_sh = AdamWState(m=param_sh, v=param_sh, t=scalar_sh)

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda p, xx, yy: moe_gpt_loss(p, xx, yy, cfg)
        )(params, x, y)
        wd_tree = gpt_wd_mask(params, weight_decay)
        params, opt_state = adamw_update(params, grads, opt_state, lr,
                                         wd_tree)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(param_sh, opt_state_sh, batch_sh, batch_sh),
        out_shardings=(param_sh, opt_state_sh, scalar_sh),
    )
