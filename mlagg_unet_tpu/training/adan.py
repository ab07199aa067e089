"""Adan optimizer (Xie et al. 2022) as an optax GradientTransformation.

The reference's nnUNetTrainerAdan family (variants/optimizer/
nnUNetTrainerAdan.py:12-63) wraps lucidrains' ``adan_pytorch`` with default
betas (0.02, 0.08, 0.01); this mirrors that implementation exactly:

    m_t = (1-b1) m + b1 g
    v_t = (1-b2) v + b2 (g - g_prev)          (zero on the first step)
    n_t = (1-b3) n + b3 (g + (1-b2)(g - g_prev))^2
    p  <- (p - lr (m_t + (1-b2) v_t) / sqrt(n_t + eps)) / (1 + lr wd)

(no bias correction, decoupled multiplicative weight decay).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates
    n: optax.Updates
    prev_grad: optax.Updates


def adan(
    learning_rate: Union[float, Callable],
    b1: float = 0.02,
    b2: float = 0.08,
    b3: float = 0.01,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)  # noqa: E731
        return AdanState(count=jnp.zeros([], jnp.int32), m=zeros(),
                         v=zeros(), n=zeros(), prev_grad=zeros())

    def update_fn(grads, state, params):
        assert params is not None, "adan needs params (weight decay coupling)"
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        first = (state.count == 0).astype(jnp.float32)

        def upd(g, m, v, n, pg, p):
            diff = (g - pg) * (1.0 - first)   # zero diff on the first step
            m = (1 - b1) * m + b1 * g
            v = (1 - b2) * v + b2 * diff
            n = (1 - b3) * n + b3 * (g + (1 - b2) * diff) ** 2
            step = lr * (m + (1 - b2) * v) / jnp.sqrt(n + eps)
            new_p = (p - step) / (1 + lr * weight_decay)
            return new_p - p, m, v, n

        flat_g, tdef = jax.tree_util.tree_flatten(grads)
        flat_m = tdef.flatten_up_to(state.m)
        flat_v = tdef.flatten_up_to(state.v)
        flat_n = tdef.flatten_up_to(state.n)
        flat_pg = tdef.flatten_up_to(state.prev_grad)
        flat_p = tdef.flatten_up_to(params)
        out = [upd(g, m, v, n, pg, p) for g, m, v, n, pg, p in
               zip(flat_g, flat_m, flat_v, flat_n, flat_pg, flat_p)]
        updates = tdef.unflatten([o[0] for o in out])
        new_state = AdanState(
            count=state.count + 1,
            m=tdef.unflatten([o[1] for o in out]),
            v=tdef.unflatten([o[2] for o in out]),
            n=tdef.unflatten([o[3] for o in out]),
            prev_grad=grads,
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
