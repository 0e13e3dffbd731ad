"""Pairwise distance helpers (parity: dassl/metrics/distance.py)."""

import jax.numpy as jnp


def compute_distance_matrix(x, y, metric="euclidean"):
    """x: (m, d), y: (n, d) -> (m, n) distance matrix."""
    if metric == "euclidean":
        return euclidean_squared_distance(x, y) ** 0.5
    if metric == "euclidean_squared":
        return euclidean_squared_distance(x, y)
    if metric == "cosine":
        return cosine_distance(x, y)
    raise ValueError(f"Unknown distance metric: {metric}")


def euclidean_squared_distance(x, y):
    """||x_i - y_j||² via the expanded quadratic form (MXU-friendly)."""
    x2 = jnp.sum(x ** 2, axis=1, keepdims=True)  # (m, 1)
    y2 = jnp.sum(y ** 2, axis=1)[None, :]  # (1, n)
    d = x2 + y2 - 2.0 * x @ y.T
    return jnp.maximum(d, 0.0)


def cosine_distance(x, y):
    """1 - cosine similarity."""
    xn = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    yn = y / jnp.linalg.norm(y, axis=1, keepdims=True)
    return 1.0 - xn @ yn.T
