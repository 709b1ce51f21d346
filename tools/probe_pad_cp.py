"""Minimal repro: does the VJP of edge-padding produce collective-permutes
under batch-only GSPMD sharding? Compare jnp.pad(mode='edge') with an
explicit concatenate formulation."""

import collections
import re

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np


def upsample_padmode(x):
    B, H, W, C = x.shape
    k = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    kv = jnp.broadcast_to(k.reshape(4, 1, 1, 1), (4, 1, 1, C))
    dn = lax.conv_dimension_numbers(x.shape, (4, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    xe = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xe, kv, (1, 1), [(0, 0), (0, 0)], lhs_dilation=(2, 1),
        dimension_numbers=dn, feature_group_count=C)


def upsample_concat(x):
    B, H, W, C = x.shape
    k = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    kv = jnp.broadcast_to(k.reshape(4, 1, 1, 1), (4, 1, 1, C))
    dn = lax.conv_dimension_numbers(x.shape, (4, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    xe = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    return lax.conv_general_dilated(
        xe, kv, (1, 1), [(0, 0), (0, 0)], lhs_dilation=(2, 1),
        dimension_numbers=dn, feature_group_count=C)


def count(fn, x):
    loss = lambda x: jnp.sum(fn(x) ** 2)
    g = jax.jit(jax.grad(loss))
    hlo = g.lower(x).compile().as_text()
    c = collections.Counter(
        m.group(1) for m in re.finditer(
            r"(collective-permute|all-reduce|all-gather|all-to-all)(?:-start)?\(", hlo))
    return dict(c)


def main():
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs).reshape(8), ("data",))
    x = jnp.ones((8, 4, 4, 16), jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    print("pad-mode-edge grad collectives:", count(upsample_padmode, x))
    print("concat-edge   grad collectives:", count(upsample_concat, x))
    np.testing.assert_allclose(
        np.asarray(upsample_padmode(x)), np.asarray(upsample_concat(x)), rtol=0, atol=0)
    print("forward outputs identical")


if __name__ == "__main__":
    main()
