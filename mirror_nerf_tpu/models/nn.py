"""Minimal functional NN building blocks (pure pytrees, no framework).

Linear parameters are stored as {"w": (in, out), "b": (out,)} and initialized
with the same distribution torch's nn.Linear uses — U(±1/sqrt(fan_in)) for
both weight and bias — so training dynamics match the reference closely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32) -> dict:
    bound = 1.0 / (in_dim ** 0.5)
    wkey, bkey = jax.random.split(key)
    p = {"w": jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return p


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def relu(x):
    return jnp.maximum(x, 0.0)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


def sigmoid(x):
    return jax.nn.sigmoid(x)
