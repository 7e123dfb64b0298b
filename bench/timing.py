"""Robust timing on the axon-relayed TPU.

This environment's PJRT relay acks dispatches asynchronously:
`block_until_ready` can return before execution finishes, and plain
loop-timing measures enqueue rate, not compute. Verified behaviors
(see SURVEY round-1 experiments):
  - first device->host readback in a process costs ~1-3 min (one-time
    path setup); subsequent readbacks ~30 ms;
  - a small readback is the only reliable completion fence.

`differential_time` therefore measures T(n_small) and T(n_big) where each
T runs the op n times CHAINED (output feeds input, impossible to elide
except by compiler algebra) inside one jit via lax.scan, followed by a tiny
readback, and reports the slope — constant offsets (dispatch, readback,
queue fill) cancel. Results above the physical roofline are flagged.
"""
from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_chained_runner(op: Callable, n_iter: int):
    """One jitted executable: op chained n_iter times + tiny output.

    `op(carry, *consts)` — pass big constant pytrees (graph tables) through
    `consts` so they become jit ARGUMENTS; closing over them embeds them in
    the executable, which remote-compile setups reject above ~100 MB."""

    @jax.jit
    def run(x, *consts):
        def body(c, _):
            return op(c, *consts), None

        out, _ = jax.lax.scan(body, x, None, length=n_iter)
        # tiny dependent output as a completion fence (works for pytrees)
        leaves = jax.tree_util.tree_leaves(out)
        return jnp.concatenate(
            [l.reshape(-1)[:1].astype(jnp.float32) for l in leaves[:4]]
        )

    return run


def differential_time(op: Callable, x, *consts, n_small: int = 4,
                      n_big: int = 36, repeats: int = 3) -> Tuple[float, dict]:
    """Per-iteration seconds for `op` (shape-preserving in its first arg),
    via chained-scan slope with readback fencing.
    Returns (seconds_per_iter, debug)."""
    r_s = make_chained_runner(op, n_small)
    r_b = make_chained_runner(op, n_big)
    # compile + warm the readback path (first D2H is minutes on this relay)
    np.asarray(r_s(x, *consts))
    np.asarray(r_b(x, *consts))

    t_small, t_big = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(r_s(x, *consts))
        t_small.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(r_b(x, *consts))
        t_big.append(time.perf_counter() - t0)
    ts, tb = min(t_small), min(t_big)
    per = (tb - ts) / (n_big - n_small)
    return max(per, 1e-9), {
        "t_small_s": ts,
        "t_big_s": tb,
        "n_small": n_small,
        "n_big": n_big,
    }


def loop_time(fn: Callable, *args, iters: int = 50, warmup: int = 5) -> float:
    """Legacy loop+block timing (reliable only when the runtime blocks)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
