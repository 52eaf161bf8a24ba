"""Isolate the axon-tunnel dispatch-chain cost: why does rt.step(100)
measure ~800 ms/step when the same program probes at ~4 ms?

Hypotheses: (a) dependent dispatches (output -> next input) serialize with a
round trip; (b) block_until_ready blocks through the tunnel; (c) the scan
path recompiles; (d) big carried pytrees pay per-dispatch transfer.
"""
import os, time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def fetch(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def t(name, fn, n=1):
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"[chain] {name:48s} {dt:9.2f} ms", flush=True)
    return dt


# small state and big state
small = jnp.zeros((128,), jnp.float32)
big = {  # ~50 MB pytree, SimState-ish
    "a": jnp.zeros((64, 32, 32, 32), jnp.float32),
    "b": jnp.zeros((64, 8192, 9), jnp.float32),
    "c": jnp.zeros((64, 16384), jnp.int32),
}

f_small = jax.jit(lambda x: x * 1.000001 + 1.0)
f_big = jax.jit(lambda s: jax.tree.map(lambda a: a * 1 + 1, s))

x = f_small(small); fetch(x)
s = f_big(big); fetch(s)

t("fetch floor", lambda: fetch(x), n=5)

def const_small():
    for _ in range(16):
        y = f_small(small)
    fetch(y)
t("16 dispatches small CONST input", const_small)

def chain_small():
    y = small
    for _ in range(16):
        y = f_small(y)
    fetch(y)
t("16 dispatches small CHAINED", chain_small)

def const_big():
    for _ in range(16):
        y = f_big(big)
    fetch(y)
t("16 dispatches big CONST input", const_big)

def chain_big():
    y = big
    for _ in range(16):
        y = f_big(y)
    fetch(y)
t("16 dispatches big CHAINED", chain_big)

def chain_big_block():
    y = big
    for _ in range(16):
        y = f_big(y)
    jax.block_until_ready(y)
t("16 dispatches big CHAINED + block_until_ready", chain_big_block)

t("block_until_ready(ready array)", lambda: jax.block_until_ready(x), n=5)
