"""Train state + jitted train/eval step builders.

Replaces the reference's mmengine Runner train loop core
(``runner.train_step`` -> loss -> AMP scale -> DDP all-reduce, SURVEY §3.1):
here the whole step — forward, backward, optimizer update, collectives — is
ONE compiled XLA program over the mesh. bf16 compute needs no loss scaling on
TPU (SURVEY §2.4 AMP row).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsprompter_tpu.parallel.mesh import (
    batch_shardings,
    param_shardings,
    zero_shardings,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @staticmethod
    def create(params, batch_stats, tx):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats or {},
            opt_state=tx.init(params),
        )


def total_loss(losses: Dict[str, jax.Array]) -> jax.Array:
    return sum(v for k, v in losses.items() if k.startswith("loss"))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    donate: bool = True,
) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics)."""

    def step_fn(state: TrainState, batch, rng):
        from rsprompter_tpu.ops.masks import unpack_batch_masks

        batch = unpack_batch_masks(batch)  # bit-packed gt_masks -> fp32
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, updates = model.apply(
                variables, batch, rng, method="loss",
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            return total_loss(out), (out, updates)

        (loss, (losses, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates_tx, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates_tx)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
        )
        metrics = {k: v for k, v in losses.items()}
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_sharded_predict(
    model,
    mesh: Mesh,
    variables,
    example_batch,
    tp_rules=(),
):
    """jit predict with the batch sharded on 'data' and params on tp_rules.

    The batched-multi-dataset-eval / serving path: N chips each decode their
    batch shard; detection outputs come back sharded the same way. Returns
    (jitted_predict, sharded_variables).
    """
    v_sh = {
        k: param_shardings(v, mesh, tp_rules if k == "params" else ())
        for k, v in variables.items()
    }
    b_sh = batch_shardings(example_batch, mesh)

    def predict(variables, batch):
        return model.apply(variables, batch, method="predict")

    fn = jax.jit(predict, in_shardings=(v_sh, b_sh))
    return fn, jax.device_put(variables, v_sh)


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    state: TrainState,
    example_batch,
    tp_rules=(),
    zero: bool = True,
):
    """jit the train step with explicit in/out shardings over ``mesh``.

    Params (and batch_stats) follow ``tp_rules`` ('model' axis) or are
    replicated; the batch shards on 'data'; optimizer state shards ZeRO-style
    on 'data' when ``zero``. Returns (jitted_step, sharded_state).
    """
    p_sh = param_shardings(state.params, mesh, tp_rules)
    bs_sh = param_shardings(state.batch_stats, mesh, ())
    opt_sh = (
        zero_shardings(state.opt_state, p_sh, mesh)
        if zero
        else jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), state.opt_state)
    )
    scalar_sh = NamedSharding(mesh, P())
    state_sh = TrainState(
        step=scalar_sh, params=p_sh, batch_stats=bs_sh, opt_state=opt_sh
    )
    b_sh = batch_shardings(example_batch, mesh)

    raw_step = make_train_step(model, tx, donate=False)
    step = jax.jit(
        raw_step.__wrapped__,
        in_shardings=(state_sh, b_sh, scalar_sh),
        out_shardings=(state_sh, scalar_sh),
        donate_argnums=(0,),
    )
    placed = jax.device_put(state, state_sh)
    # device_put reuses a matching source buffer as one of the target
    # shards (no-copy alias) — the donated step would then delete the
    # CALLER's arrays on its first call. Force fresh buffers (jnp.copy is a
    # real copy_p, never passthrough, and preserves the sharding).
    sharded_state = jax.tree_util.tree_map(jnp.copy, placed)
    return step, sharded_state
