"""Bitonic sorting network over the last axis, as pure elementwise ops.

XLA's sort primitive is pathologically slow on TPU for our shapes (a
[1M, 128] argsort measures in tens of seconds); a bitonic network of
roll + min/max/select stages compiles to pure VPU code with no dynamic
gathers.  The log2(n)*(log2(n)+1)/2 compare-exchange stages run under one
`lax.fori_loop` so only the loop carry stays live (an unrolled network
keeps tens of full-size intermediates alive and blows out HBM).  Payload
arrays ride along with the key (multi-operand sort); carrying an iota
payload and sorting by it restores the original order (inverse permute).
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bitonic_sort", "bitonic_unsort"]


def _stage_params(n):
    """Static (k, j) schedule of the network as arrays."""
    ks, js = [], []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            ks.append(k)
            js.append(j)
            j //= 2
        k *= 2
    return np.asarray(ks, np.int32), np.asarray(js, np.int32)


def bitonic_sort(key, payloads=()):
    """Sort `key` ascending along the last axis (power-of-two length),
    permuting each payload identically.  Returns (key_sorted, payloads).

    Stages are unrolled with STATIC shifts: dynamic-shift rolls inside a
    fori_loop made XLA compilation take minutes per instantiation, while
    static rotations compile fast and fuse; liveness keeps only the current
    key/payloads plus one partner temporary alive."""
    n = key.shape[-1]
    assert n & (n - 1) == 0, "bitonic sort needs a power-of-two length"
    ks, js = _stage_params(n)
    idx = jnp.arange(n)
    payloads = tuple(payloads)

    for k, j in zip(ks.tolist(), js.tolist()):
        low = (idx & j) == 0
        take_min = ((idx & k) == 0) == low

        def partner(x):
            return jnp.where(low, jnp.roll(x, -j, axis=-1),
                             jnp.roll(x, j, axis=-1))

        pk = partner(key)
        new_key = jnp.where(take_min, jnp.minimum(key, pk),
                            jnp.maximum(key, pk))
        take_p = jnp.where(take_min, pk < key, pk > key)
        payloads = tuple(jnp.where(take_p, partner(p), p)
                         for p in payloads)
        key = new_key
    return key, list(payloads)


def bitonic_unsort(order, payloads):
    """Invert a permutation: `order` is the iota payload produced by
    bitonic_sort; sorting by it restores original positions."""
    _, out = bitonic_sort(order.astype(jnp.int32), payloads)
    return out
