"""Fuzzy-logic confidence combinators (reference utils/utils.py:240-253)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fuzzy_and(x, y):
    return x * y


def fuzzy_or(x, y):
    return x + y - x * y


def fuzzy_not(x):
    return 1.0 - x


def fuzzy_and_zadeh(x, y, eps: float = 1e-3):
    stacked = jnp.concatenate([x, y], axis=-1)
    return -eps * jax.nn.logsumexp(-stacked / eps, axis=-1, keepdims=True)


def fuzzy_or_zadeh(x, y, eps: float = 1e-3):
    stacked = jnp.concatenate([x, y], axis=-1)
    return eps * jax.nn.logsumexp(stacked / eps, axis=-1, keepdims=True)
