"""Functional MLP building block.

This is the TPU answer to the reference ffmlp CUDA extension
(ffmlp/src/ffmlp.cu — a hand-fused fp16 WMMA MLP): on TPU a chain of
[M, Cin] @ [Cin, Cout] matmuls is already a single fused MXU pipeline under
XLA, so "fully-fused MLP" needs no kernel at all (SURVEY.md §2.1 N13 note).
Compute runs in bf16 with fp32 accumulation; params stay fp32 masters.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def mlp_init(key: jax.Array, dims: Sequence[int], bias: bool = False):
    """Kaiming-uniform init matching torch.nn.Linear defaults so that training
    dynamics are comparable with the reference's bias-free Linear stacks."""
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for k, (din, dout) in zip(keys, zip(dims[:-1], dims[1:])):
        bound = 1.0 / math.sqrt(din)
        w = jax.random.uniform(k, (din, dout), jnp.float32, -bound, bound)
        layer = {"w": w}
        if bias:
            layer["b"] = jnp.zeros((dout,), jnp.float32)
        params.append(layer)
    return params


def mlp_apply(params, x: jnp.ndarray, activation=jax.nn.relu,
              compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Apply an MLP; hidden activations use `activation`, output is linear.

    Matmuls run on the MXU in `compute_dtype` with fp32 accumulation
    (preferred_element_type); the final output is returned in fp32.
    """
    h = x.astype(compute_dtype)
    n = len(params)
    for i, layer in enumerate(params):
        w = layer["w"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if "b" in layer:
            h = h + layer["b"]
        if i != n - 1:
            h = activation(h).astype(compute_dtype)
    return h.astype(jnp.float32)
