"""Shared slope-method timing harness for device benchmarks.

The tunneled backend adds a large fixed RPC cost to every host-side sync,
which swamps per-stage measurements.  Each stage is looped K times *inside*
one jitted program with a serializing data dependency; timing the same
program at two different K and taking the slope (T(K_HI) - T(K_LO)) /
(K_HI - K_LO) cancels both the RPC floor and compile-cache effects.

Inputs MUST be passed as arguments to `fn` (never closure-captured): a
nullary jitted lambda embeds its arrays as HLO constants, letting XLA
constant-fold the whole stage at compile time and report ~0 ms.
"""

import time

import jax

K_LO, K_HI = 10, 60


def _loop(fn, k):
    import jax.numpy as jnp

    def body_total(out):
        # consume EVERY output leaf with a full reduction: feeding only one
        # element back lets XLA dead-code-eliminate the rest of the stage
        # (a value_and_grad stage timed as forward-only before this fix)
        return sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(out)
        )

    def loop(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            tot = body_total(out)
            eps = (tot * 0.0).astype(a[0].dtype)
            return a[0] + eps, tot

        _, outs = jax.lax.scan(body, a[0], None, length=k)
        return outs

    return jax.jit(loop)


def _time(fn_j, args, reps=3):
    jax.device_get(fn_j(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# every timeit() call in the process records into this, so perf scripts can
# dump their whole run as one artifact (scripts/perf_check.py diffs these)
RECORDS = {}


def timeit(name, fn, *args, width=50):
    assert args, "pass inputs as args — closure capture constant-folds (see module docstring)"
    t_lo = _time(_loop(fn, K_LO), args)
    t_hi = _time(_loop(fn, K_HI), args)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    print(f"{name:{width}s} {per*1000:9.3f} ms")
    RECORDS[name] = round(per * 1000, 4)
    return per


def dump_records(path, source, note=None):
    """Write {stage_ms, backend, source[, note]} JSON for perf/ artifacts."""
    import json

    payload = {
        "stage_ms": dict(RECORDS),
        "backend": jax.default_backend(),
        "source": source,
    }
    if note:
        payload["note"] = note
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(f"wrote {path} ({len(RECORDS)} stages)")
